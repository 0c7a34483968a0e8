"""Metrics/losses vs torch+nltk oracles: pack_padded CE, rollout alignment,
top-k accuracy, corpus BLEU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
nltk_bleu = pytest.importorskip("nltk.translate.bleu_score")

from tpu_captioner.eval.bleu import bleu_1_to_4, corpus_bleu
from tpu_captioner.eval.metrics import (
    decode_lengths_from_sequences,
    masked_cross_entropy,
    rollout_token_mask,
    topk_correct,
)

B, T, V = 5, 9, 23


def test_masked_ce_equals_pack_padded_cross_entropy():
    """Mask (t < decode_len) CE mean == CrossEntropyLoss on
    pack_padded_sequence data (train.py:266-276)."""
    torch.manual_seed(0)
    scores = torch.randn(B, T, V)
    targets = torch.randint(0, V, (B, T))
    lengths = torch.tensor([9, 7, 4, 1, 6])
    packed_s = torch.nn.utils.rnn.pack_padded_sequence(
        scores, lengths, batch_first=True, enforce_sorted=False
    ).data
    packed_t = torch.nn.utils.rnn.pack_padded_sequence(
        targets, lengths, batch_first=True, enforce_sorted=False
    ).data
    want = torch.nn.CrossEntropyLoss()(packed_s, packed_t).item()

    mask = jnp.arange(T)[None, :] < jnp.asarray(lengths.numpy())[:, None]
    ce_sum, tok = masked_cross_entropy(
        jnp.asarray(scores.numpy()), jnp.asarray(targets.numpy()), mask
    )
    assert int(tok) == int(lengths.sum())
    np.testing.assert_allclose(float(ce_sum / tok), want, rtol=1e-5)


def test_rollout_mask_matches_reference_algorithm():
    """rollout_token_mask == preprocessDecoderOutputForMetrics filtering
    (utils/utils.py:261-295), checked on random sequences with a literal
    numpy transcription of the documented algorithm."""
    rng = np.random.default_rng(1)
    end_id, pad_id, max_dec = 21, 0, T
    seqs = rng.integers(1, V, (B, T))
    seqs[0, 3] = end_id
    seqs[2, 0] = end_id
    seqs[4, T - 1] = end_id
    caps = rng.integers(1, V, (B, T + 2))
    caps[1, 5:] = pad_id
    caps[3, 2:] = pad_id

    # Oracle: lengths + per-token validity per the reference spec.
    want_mask = np.zeros((B, T), dtype=bool)
    want_lengths = []
    for i in range(B):
        hits = np.nonzero(seqs[i] == end_id)[0]
        ln = hits[0] + 1 if len(hits) else max_dec
        want_lengths.append(ln)
        for t in range(ln):
            if caps[i, 1 + t] != pad_id:
                want_mask[i, t] = True

    mask, targets, lengths = rollout_token_mask(
        jnp.asarray(seqs), jnp.asarray(caps), end_id, pad_id, max_dec
    )
    np.testing.assert_array_equal(np.asarray(lengths), want_lengths)
    np.testing.assert_array_equal(np.asarray(mask), want_mask)
    np.testing.assert_array_equal(np.asarray(targets), caps[:, 1 : 1 + T])


def test_topk_correct_matches_torch():
    torch.manual_seed(2)
    scores = torch.randn(40, V)
    targets = torch.randint(0, V, (40,))
    _, ind = scores.topk(5, 1, True, True)
    want = ind.eq(targets.view(-1, 1).expand_as(ind)).sum().item()
    got = topk_correct(jnp.asarray(scores.numpy()), jnp.asarray(targets.numpy()), 5)
    assert int(got) == want


@pytest.mark.parametrize("case", ["normal", "degenerate", "empty_hyp_tail"])
def test_corpus_bleu_matches_nltk(case):
    rng = np.random.default_rng(3)
    n = 30
    refs, hyps = [], []
    for i in range(n):
        rs = [list(rng.integers(1, 12, rng.integers(4, 15))) for _ in range(5)]
        if case == "normal":
            h = list(rs[0][: rng.integers(3, len(rs[0]) + 1)]) + list(
                rng.integers(1, 12, 2)
            )
        elif case == "degenerate":
            h = list(rng.integers(50, 60, rng.integers(1, 4)))  # no overlap
        else:
            h = list(rs[1]) if i % 2 == 0 else [int(rng.integers(1, 12))]
        refs.append(rs)
        hyps.append(h)
    for n_order, weights in [
        (1, (1.0, 0, 0, 0)),
        (2, (0.5, 0.5, 0, 0)),
        (3, (0.33, 0.33, 0.33, 0)),
        (4, (0.25, 0.25, 0.25, 0.25)),
    ]:
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            want = nltk_bleu.corpus_bleu(refs, hyps, weights=weights)
        got = corpus_bleu(refs, hyps, weights=weights)
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-300)


def test_bleu_1_to_4_tuple():
    refs = [[[1, 2, 3, 4]]]
    hyps = [[1, 2, 3, 4]]
    b = bleu_1_to_4(refs, hyps)
    assert all(abs(x - 1.0) < 1e-12 for x in b)
