"""Streaming spot extraction (config.spot_streaming) == the dense path.

The dense path materializes five (B, L, L) tag/score maps and top-k's the
full grid (models/decoder.compact_spots); the streaming path reduces each
pair-grid row block to its own top-k candidates as it is produced
(block_spot_candidates) and merges once (merge_spot_candidates). With
continuous random scores (ties have measure zero) the surviving spot sets
must be identical, as must spot_count/seq_len.

Covers: the inference path, the eval also_decode path (losses must be
untouched), a ragged L (not a multiple of pair_block_size), overflow
(spot_count > k), and the tiny-grid pad case (fewer candidates than k).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peneo_tpu.config import LiltConfig, PEneoConfig
from peneo_tpu.models.decoder import HEAD_NAMES, PEneoDecoder

H = 96


def _cfg(**kw):
    bb = LiltConfig(vocab_size=64, hidden_size=H, num_hidden_layers=2,
                    num_attention_heads=4, intermediate_size=2 * H,
                    channel_shrink_ratio=4).to_dict()
    return PEneoConfig(backbone_name="lilt-infoxlm-base", backbone_config=bb,
                       spot_topk="exact", **kw)


def _spot_sets(out):
    """per-sample sorted [(idx, tag, score)] of the non-empty slots."""
    sets = []
    for b in range(out["spot_idx"].shape[0]):
        live = out["spot_score"][b] > -1
        sets.append(sorted(zip(out["spot_idx"][b][live].tolist(),
                               out["spot_tag"][b][live].tolist(),
                               np.round(out["spot_score"][b][live], 6).tolist())))
    return sets


def _run(cfg, x, labels=None, also_decode=False):
    dec = PEneoDecoder(cfg)
    params = dec.init(jax.random.PRNGKey(1), x)
    return jax.device_get(dec.apply(params, x, labels=labels,
                                    also_decode=also_decode))


@pytest.mark.parametrize("Ld,k,bs", [(129, 64, 64),   # ragged L, overflow-able
                                     (96, 512, 64),   # candidates < k (pad)
                                     (256, 48, 64)])  # multi-block, small k
def test_inference_identity(Ld, k, bs):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, Ld, H)), jnp.float32)
    outs = {}
    for stream in (False, True):
        cfg = _cfg(max_spots_per_head=k, spot_streaming=stream,
                   pair_block_size=bs)
        outs[stream] = _run(cfg, x)
    for name in HEAD_NAMES:
        d, s = outs[False][name], outs[True][name]
        np.testing.assert_array_equal(d["spot_count"], s["spot_count"])
        np.testing.assert_array_equal(d["seq_len"], s["seq_len"])
        overflow = (d["spot_count"] > k).any()
        if overflow:
            # both are valid top-k cuts; scores must agree slot-for-slot
            np.testing.assert_allclose(
                np.sort(d["spot_score"], axis=1),
                np.sort(s["spot_score"], axis=1)[:, -d["spot_score"].shape[1]:],
                rtol=1e-6)
        else:
            assert _spot_sets(d) == _spot_sets(s), name


def test_eval_also_decode_identity():
    """also_decode: identical losses AND identical decode spots."""
    Ld, k = 129, 64
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, Ld, H)), jnp.float32)
    labels = {}
    lab_rng = np.random.default_rng(7)
    for name in HEAD_NAMES:
        m = np.zeros((2, Ld, Ld), np.int8)
        for b in range(2):
            ij = lab_rng.integers(0, Ld, (20, 2))
            ij.sort(axis=1)
            m[b, ij[:, 0], ij[:, 1]] = lab_rng.integers(1, 2, 20)
        labels[name] = jnp.asarray(m)
    res = {}
    for stream in (False, True):
        cfg = _cfg(max_spots_per_head=k, spot_streaming=stream,
                   pair_block_size=64)
        res[stream] = _run(cfg, x, labels=labels, also_decode=True)
    losses_d, dec_d = res[False]
    losses_s, dec_s = res[True]
    for key in losses_d:
        np.testing.assert_allclose(losses_s[key], losses_d[key], rtol=1e-6)
    for name in HEAD_NAMES:
        np.testing.assert_array_equal(dec_d[name]["spot_count"],
                                      dec_s[name]["spot_count"])
        assert _spot_sets(dec_d[name]) == _spot_sets(dec_s[name]), name


def test_streaming_decodes_through_pipeline():
    """The streaming output feeds pack/unpack + host decode unchanged."""
    from peneo_tpu.models.decoder import pack_spots
    from peneo_tpu.pipeline.decode import unpack_spots

    Ld, k = 96, 64
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, Ld, H)), jnp.float32)
    cfg = _cfg(max_spots_per_head=k, spot_streaming=True, pair_block_size=64)
    dec = PEneoDecoder(cfg)
    params = dec.init(jax.random.PRNGKey(1), x)
    out = dec.apply(params, x)
    big, small = jax.device_get(pack_spots(out))
    unpacked = unpack_spots(big, small)
    ref = jax.device_get(out)
    for h, name in enumerate(HEAD_NAMES):
        np.testing.assert_array_equal(unpacked[name]["spot_idx"],
                                      ref[name]["spot_idx"])
        np.testing.assert_allclose(unpacked[name]["spot_score"],
                                   ref[name]["spot_score"], rtol=0)
