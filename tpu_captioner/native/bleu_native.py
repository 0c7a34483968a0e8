"""Native-accelerated corpus BLEU (falls back to the pure-Python scorer).

Same semantics as tpu_captioner.eval.bleu.corpus_bleu (nltk-exact, see that
module); the n-gram counting runs in C++ (native/bleu.cpp), turning the
per-validation-epoch host scoring of ~25k COCO hypotheses from seconds of
Python Counter loops into milliseconds.
"""

from __future__ import annotations

import math
import sys
from typing import List, Sequence, Tuple

import numpy as np

from tpu_captioner.eval import bleu as py_bleu
from tpu_captioner.native.lib import get_lib


def _flatten(sentences: List[Sequence[int]]):
    offsets = np.zeros(len(sentences) + 1, dtype=np.int64)
    for i, s in enumerate(sentences):
        offsets[i + 1] = offsets[i] + len(s)
    tokens = np.empty(offsets[-1], dtype=np.int32)
    for i, s in enumerate(sentences):
        tokens[offsets[i] : offsets[i + 1]] = s
    return tokens, offsets


def corpus_bleu_stats(
    references: List[List[Sequence[int]]],
    hypotheses: List[Sequence[int]],
    max_order: int = 4,
) -> Tuple[np.ndarray, np.ndarray, int, int]:
    """(numerators[max_order], denominators[max_order], hyp_len, ref_len)."""
    lib = get_lib()
    if lib is None:
        nums = np.zeros(max_order, dtype=np.int64)
        dens = np.zeros(max_order, dtype=np.int64)
        for n in range(1, max_order + 1):
            nums[n - 1], dens[n - 1] = py_bleu.modified_precision(
                references, hypotheses, n
            )
        hyp_len = sum(len(h) for h in hypotheses)
        ref_len = sum(
            py_bleu.closest_ref_length(r, len(h))
            for r, h in zip(references, hypotheses)
        )
        return nums, dens, hyp_len, ref_len

    import ctypes as c

    hyp_tokens, hyp_offsets = _flatten(hypotheses)
    flat_refs = [r for refs in references for r in refs]
    ref_tokens, ref_offsets = _flatten(flat_refs)
    ref_counts = np.asarray([len(r) for r in references], dtype=np.int64)
    nums = np.zeros(max_order, dtype=np.int64)
    dens = np.zeros(max_order, dtype=np.int64)
    hyp_len = c.c_int64(0)
    ref_len = c.c_int64(0)

    def p(arr, typ):
        return arr.ctypes.data_as(c.POINTER(typ))

    lib.corpus_bleu_stats(
        p(hyp_tokens, c.c_int32), p(hyp_offsets, c.c_int64), len(hypotheses),
        p(ref_tokens, c.c_int32), p(ref_offsets, c.c_int64), p(ref_counts, c.c_int64),
        max_order, p(nums, c.c_int64), p(dens, c.c_int64),
        c.byref(hyp_len), c.byref(ref_len),
    )
    return nums, dens, int(hyp_len.value), int(ref_len.value)


def bleu_1_to_4(
    references: List[List[Sequence[int]]], hypotheses: List[Sequence[int]]
) -> Tuple[float, float, float, float]:
    """nltk-exact BLEU-1..4 from one native counting pass."""
    assert len(references) == len(hypotheses)
    nums, dens, hyp_len, ref_len = corpus_bleu_stats(references, hypotheses, 4)
    bp = py_bleu.brevity_penalty(ref_len, hyp_len)
    if nums[0] == 0:
        return (0.0, 0.0, 0.0, 0.0)
    logp = [
        math.log(n / d) if n > 0 else math.log(sys.float_info.min)
        for n, d in zip(nums, dens)
    ]
    out = []
    for weights in (py_bleu.BLEU_WEIGHTS[i] for i in (1, 2, 3, 4)):
        s = sum(w * lp for w, lp in zip(weights, logp) if w)
        out.append(bp * math.exp(s))
    return tuple(out)
