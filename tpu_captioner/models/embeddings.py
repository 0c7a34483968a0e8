"""Pretrained word-embedding loading (reference transformerDecoder.py:29-42).

The reference uses gensim KeyedVectors to read word2vec-binary / GloVe-text
files; gensim is not a dependency here, so both formats are parsed directly
(word2vec binary header + float32 vectors; GloVe "word v1 .. vn" text lines),
with optional gzip.  Rows for out-of-vocabulary words are zero, exactly like
the reference's zero-initialised matrix (transformerDecoder.py:30,38-41).

``extract_embeddings_npz`` converts a raw embedding file into a compact .npz
keyed by the word map, which is what configs point at (EMBEDDING_PRESETS).
"""

from __future__ import annotations

import gzip
import os
from typing import Dict, Iterable, Tuple

import numpy as np


def _open_maybe_gzip(path: str, mode: str = "rb"):
    if path.endswith(".gz"):
        return gzip.open(path, mode)
    return open(path, mode)


def _iter_word2vec_binary(f) -> Iterable[Tuple[str, np.ndarray]]:
    header = f.readline().split()
    vocab_size, dim = int(header[0]), int(header[1])
    binary_len = 4 * dim
    for _ in range(vocab_size):
        word_bytes = b""
        while True:
            ch = f.read(1)
            if ch == b" ":
                break
            if ch != b"\n":
                word_bytes += ch
        vec = np.frombuffer(f.read(binary_len), dtype=np.float32)
        yield word_bytes.decode("utf-8", errors="replace"), vec


def _iter_glove_text(f) -> Iterable[Tuple[str, np.ndarray]]:
    for line in f:
        if isinstance(line, bytes):
            line = line.decode("utf-8", errors="replace")
        parts = line.rstrip().split(" ")
        if len(parts) < 2:
            continue
        yield parts[0], np.asarray(parts[1:], dtype=np.float32)


def load_pretrained_word_embeddings(
    word_map: Dict[str, int], path: str, embed_dim: int
) -> np.ndarray:
    """Build the (vocab, embed_dim) matrix; zero rows for OOV words.

    Accepts: .npz produced by ``extract_embeddings_npz`` (fast path), a
    word2vec binary (.bin/.gz with 'word2vec' in the name), or GloVe text.
    """
    matrix = np.zeros((len(word_map), embed_dim), dtype=np.float32)
    if path.endswith(".npz"):
        data = np.load(path, allow_pickle=False)
        words = [w for w in data["words"]]
        vecs = data["vectors"]
        lut = {str(w): i for i, w in enumerate(words)}
        for word, idx in word_map.items():
            j = lut.get(word)
            if j is not None:
                matrix[idx] = vecs[j][:embed_dim]
        return matrix

    is_binary = "word2vec" in os.path.basename(path)
    with _open_maybe_gzip(path, "rb") as f:
        it = _iter_word2vec_binary(f) if is_binary else _iter_glove_text(f)
        for word, vec in it:
            idx = word_map.get(word)
            if idx is not None and len(vec) == embed_dim:
                matrix[idx] = vec
    return matrix


def extract_embeddings_npz(
    raw_path: str, word_map: Dict[str, int], embed_dim: int, out_path: str
) -> None:
    """One-time conversion: raw embedding file -> .npz restricted to vocab.
    Word ids are contiguous 0..V-1 (vocab.py), so row i of the stored matrix
    is the vector for the word with id i."""
    matrix = load_pretrained_word_embeddings(word_map, raw_path, embed_dim)
    words = np.array(sorted(word_map, key=word_map.get))
    np.savez_compressed(out_path, words=words, vectors=matrix)


def save_embeddings_npz(words, vectors, out_path: str) -> None:
    np.savez_compressed(out_path, words=np.asarray(words), vectors=np.asarray(vectors, dtype=np.float32))
