"""labels_as_spots mode: on-device scatter labels must give identical losses
and identical gt decode to the dense label path."""

import numpy as np

import jax
import jax.numpy as jnp

from peneo_tpu.config import LiltConfig, PEneoConfig
from peneo_tpu.data.collator import PEneoCollator
from peneo_tpu.data.datasets import RFUNDDataset
from peneo_tpu.data.fetchers import fetch_xlm
from peneo_tpu.data.synthetic import ToyTokenizer, write_rfund_dataset
from peneo_tpu.models.peneo import PEneoModel
from peneo_tpu.pipeline import decode as dec


def test_spot_labels_match_dense(tmp_path):
    root = write_rfund_dataset(str(tmp_path / "d"), n_train=4, n_val=1)
    tok = ToyTokenizer()
    ds = RFUNDDataset(root, "train", "en", tok, tokenizer_fetcher=fetch_xlm,
                      max_token_len=48, add_cls_token=True)
    feats = [ds[i] for i in range(3)]

    dense_coll = PEneoCollator(max_seq_len=48, add_cls_token=True)
    spot_coll = PEneoCollator(max_seq_len=48, add_cls_token=True,
                              labels_as_spots=True, max_label_spots=64)
    b_dense = dense_coll(feats)
    b_spots = spot_coll(feats)
    assert b_spots.labels["line_extraction"].shape == (3, 64, 3)

    cfg = PEneoConfig(
        backbone_name="lilt-infoxlm-base",
        backbone_config=LiltConfig(
            vocab_size=tok.vocab_size, hidden_size=48, num_hidden_layers=1,
            num_attention_heads=4, intermediate_size=96, pad_token_id=0,
            max_position_embeddings=64).to_dict(),
        pair_block_size=16,
    )
    model = PEneoModel(cfg, dtype=jnp.float32)
    inputs = dict(input_ids=b_dense.input_ids, bbox=b_dense.bbox,
                  attention_mask=b_dense.attention_mask)
    params = model.init(jax.random.PRNGKey(0), inputs["input_ids"],
                        inputs["bbox"], inputs["attention_mask"],
                        deterministic=True)["params"]
    loss_dense = model.apply({"params": params}, labels=b_dense.labels,
                             deterministic=True, **inputs)
    loss_spots = model.apply({"params": params}, labels=b_spots.labels,
                             deterministic=True, **inputs)
    for k in loss_dense:
        np.testing.assert_allclose(float(loss_dense[k]), float(loss_spots[k]),
                                   rtol=1e-6, err_msg=k)

    # gt decode identical through both label formats
    for i in range(3):
        sl = int(b_dense.seq_len[i])
        a = dec.spots_from_label_matrices(b_dense.labels, i, sl)
        b = dec.spots_from_label_matrices(b_spots.labels, i, sl)
        assert a == b
