"""Decode + evaluation parity vs the reference implementation on randomized
synthetic head outputs (the strongest possible test of the graph-walk parser
and metric semantics without real data)."""

import numpy as np
import pytest

from tests.conftest import reference_available, enable_reference_imports
from peneo_tpu.data import tagging as tg
from peneo_tpu.pipeline import decode as dec
from peneo_tpu.pipeline import evaluation as ev

L = 24
HEAD_ORDER = dec.HEAD_NAMES


def _random_head_logits(rng, biased=True):
    """Random logits per head: mostly background with a handful of links."""
    out = {}
    for name in HEAD_ORDER:
        c = 2 if name == "line_extraction" else 3
        logits = rng.normal(size=(L, L, c))
        if biased:
            logits[..., 0] += 2.5  # sparse positives, like a trained model
        out[name] = logits
    return out


def _ref_decode(logits_by_head, decode_gt=False):
    enable_reference_imports()
    import torch
    from model.peneo_decoder import HandshakingTaggingScheme as HTS
    from pipeline.decode import sample_decode_peneo

    text = [f"t{i} " for i in range(L)]
    flat = {
        name: torch.tensor(tg.flatten_triu(logits_by_head[name]))
        for name in HEAD_ORDER
    }
    return sample_decode_peneo(
        handshaking_tagger=HTS(),
        text=text,
        line_extraction_shaking=flat["line_extraction"],
        ent_linking_h2h_shaking=flat["ent_linking_h2h"],
        ent_linking_t2t_shaking=flat["ent_linking_t2t"],
        line_grouping_h2h_shaking=flat["line_grouping_h2h"],
        line_grouping_t2t_shaking=flat["line_grouping_t2t"],
        seq_len=L,
        decode_gt=decode_gt,
    )


def _our_decode(logits_by_head):
    text = [f"t{i} " for i in range(L)]
    spots = {name: tg.logits_to_spots(logits_by_head[name]) for name in HEAD_ORDER}
    return dec.decode_sample(text, spots, decode_gt=False)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_decode_sample_parity_random():
    rng = np.random.default_rng(7)
    n_nonempty = 0
    for trial in range(40):
        logits = _random_head_logits(rng)
        ref = _ref_decode(logits)
        ours = _our_decode(logits)
        assert ours[0] == ref[0], f"kv pairs differ (trial {trial})"
        assert ours[1] == ref[1], f"lines differ (trial {trial})"
        assert ours[2] == ref[2], f"le map differs (trial {trial})"
        assert ours[3] == ref[3], f"el head map differs (trial {trial})"
        assert ours[4] == ref[4], f"el tail map differs (trial {trial})"
        assert ours[5] == ref[5], f"lg head map differs (trial {trial})"
        assert ours[6] == ref[6], f"lg tail map differs (trial {trial})"
        n_nonempty += bool(ref[0])
    assert n_nonempty >= 1  # ensure the kv path was actually exercised


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_decode_gt_parity_random():
    rng = np.random.default_rng(8)
    for trial in range(20):
        # dense random gt tag matrices (sparse links)
        tags = {}
        for name in HEAD_ORDER:
            c = 2 if name == "line_extraction" else 3
            m = np.zeros((L, L), dtype=np.int64)
            for _ in range(6):
                i = int(rng.integers(0, L))
                j = int(rng.integers(i, L))
                m[i, j] = int(rng.integers(1, c))
            tags[name] = m

        enable_reference_imports()
        import torch
        from model.peneo_decoder import HandshakingTaggingScheme as HTS
        from pipeline.decode import sample_decode_peneo

        text = [f"t{i} " for i in range(L)]
        flat = {n: torch.tensor(tg.flatten_triu(tags[n])) for n in HEAD_ORDER}
        ref = sample_decode_peneo(
            handshaking_tagger=HTS(), text=text,
            line_extraction_shaking=flat["line_extraction"],
            ent_linking_h2h_shaking=flat["ent_linking_h2h"],
            ent_linking_t2t_shaking=flat["ent_linking_t2t"],
            line_grouping_h2h_shaking=flat["line_grouping_h2h"],
            line_grouping_t2t_shaking=flat["line_grouping_t2t"],
            seq_len=L, decode_gt=True,
        )
        spots = {n: tg.matrix_to_spots(tags[n]) for n in HEAD_ORDER}
        ours = dec.decode_sample(text, spots, decode_gt=True)
        for k in range(7):
            assert ours[k] == ref[k], f"component {k} differs (trial {trial})"


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_kvpe_metric_parity():
    enable_reference_imports()
    from pipeline.evaluation import calculate_detail_KVPE_metric, calculate_KVPE_metric

    rng = np.random.default_rng(9)
    all_pred, all_gt, fnames = [], [], []
    for i in range(6):
        logits = _random_head_logits(rng)
        all_pred.append(_our_decode(logits))
        gt_logits = _random_head_logits(rng)
        all_gt.append(_our_decode(gt_logits))
        fnames.append(f"doc{i % 4}.png")  # duplicates exercise fname dedup

    ref_m, ref_d = calculate_KVPE_metric(all_pred, all_gt, fnames)
    our_m, our_d = ev.calculate_kvpe_metric(all_pred, all_gt, fnames)
    assert our_m == ref_m
    assert our_d["num_pred"] == ref_d["num_pred"]
    assert our_d["num_sample_processed"] == ref_d["num_sample_processed"]

    ref_s, ref_dd = calculate_detail_KVPE_metric(all_pred, all_gt, fnames)
    our_s, our_dd = ev.calculate_detail_kvpe_metric(all_pred, all_gt, fnames)
    assert our_s == ref_s
    for task in ev.TASKS:
        assert our_dd[task] == ref_dd[task], task


def test_build_link_map_bijection():
    spots = [
        (0, 5, 1, 0.9), (0, 6, 1, 0.8),   # head 0 keeps tail 5 (higher score)
        (1, 5, 1, 0.95),                   # tail 5 contested: head 1 wins
        (7, 2, 2, 0.7),                    # triu flip → 2 -> 7
    ]
    m = dec.build_link_map(spots, top_score_only=True, triu_mode=True)
    assert m == {1: 5, 2: 7}

    lists = dec.build_link_map(spots, top_score_only=False, triu_mode=True)
    assert lists == {0: [5, 6], 1: [5], 2: [7]}
