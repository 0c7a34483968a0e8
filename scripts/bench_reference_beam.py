"""Measure the reference's beam-search captioning rate on this host's CPU.

The reference captions strictly one image per process on CPU
(caption.py:21,433-): ConvNeXt-Base encode, then a Python beam loop that
re-runs the FULL transformer decoder on the growing prefix every step with
no KV cache (caption.py:204-216).  This harness reproduces that pipeline
from its documented semantics (SURVEY.md C20/§3.4) with public torch
primitives — torchvision is not installed here, so the ConvNeXt-Base
architecture is rebuilt from nn.Conv2d/nn.Linear (same structure the
test-suite oracle uses, tests/test_convnext.py).

Weights are random, so no beam emits <end> and the loop runs to the full
50-step cap — the IDENTICAL condition under which bench_full.py measures our
beam_search_batch (random init), making captions/sec apples-to-apples.

Writes {"metric": "reference_beam5_captions_per_sec", ...} and is the source
of the beam vs_baseline denominator in bench_full.py.
"""

import json
import math
import os
import sys
import time

import torch
import torch.nn as nn
import torch.nn.functional as F

DEPTHS = (3, 3, 27, 3)
DIMS = (128, 256, 512, 1024)


class Block(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dw = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.ln = nn.LayerNorm(dim, eps=1e-6)
        self.pw1 = nn.Linear(dim, 4 * dim)
        self.pw2 = nn.Linear(4 * dim, dim)
        self.gamma = nn.Parameter(torch.full((dim, 1, 1), 1e-6))

    def forward(self, x):
        r = self.dw(x).permute(0, 2, 3, 1)
        r = self.pw2(F.gelu(self.pw1(self.ln(r)))).permute(0, 3, 1, 2)
        return x + self.gamma * r


class ConvNeXtBase(nn.Module):
    def __init__(self):
        super().__init__()
        layers = [nn.Conv2d(3, DIMS[0], 4, stride=4)]
        self.stem_ln = nn.LayerNorm(DIMS[0], eps=1e-6)
        self.stem = layers[0]
        self.stages = nn.ModuleList()
        self.downs = nn.ModuleList()
        for s, (n, d) in enumerate(zip(DEPTHS, DIMS)):
            if s > 0:
                self.downs.append(
                    nn.Sequential(nn.Conv2d(DIMS[s - 1], d, 2, stride=2))
                )
            self.stages.append(nn.Sequential(*[Block(d) for _ in range(n)]))

    def forward(self, x):
        x = self.stem(x)
        x = self.stem_ln(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        for s, stage in enumerate(self.stages):
            if s > 0:
                x = self.downs[s - 1](x)
            x = stage(x)
        # Adaptive pool to 7x7, channels-last (models/encoder.py:20-27).
        x = F.adaptive_avg_pool2d(x, 7)
        return x.permute(0, 2, 3, 1)  # (B, 7, 7, 1024)


class RefTransformerDecoder(nn.Module):
    """Reference decoder structure (models/transformerDecoder.py:53-108):
    embedding + sinusoidal PE, 1024->512 encoder projection, 6-layer 8-head
    nn.TransformerDecoder (seq-first), vocab head."""

    def __init__(self, vocab, embed=512, ffn=512, layers=6, heads=8, max_len=52):
        super().__init__()
        self.embed = nn.Embedding(vocab, embed)
        pe = torch.zeros(max_len, embed)
        pos = torch.arange(max_len).unsqueeze(1).float()
        div = torch.exp(
            torch.arange(0, embed, 2).float() * (-math.log(10000.0) / embed)
        )
        pe[:, 0::2] = torch.sin(pos * div)
        pe[:, 1::2] = torch.cos(pos * div)
        self.register_buffer("pe", pe.unsqueeze(1))  # (L, 1, E)
        self.enc_proj = nn.Linear(1024, embed)
        layer = nn.TransformerDecoderLayer(embed, heads, dim_feedforward=ffn)
        self.dec = nn.TransformerDecoder(layer, layers)
        self.fc = nn.Linear(embed, vocab)

    def forward(self, prefix, memory):
        # prefix: (k, t) tokens; memory: (k, 49, 1024). Full pass, last pos.
        t = prefix.shape[1]
        x = self.embed(prefix).transpose(0, 1) + self.pe[:t]  # (t, k, E)
        mem = self.enc_proj(memory).transpose(0, 1)  # (49, k, E)
        mask = torch.triu(torch.full((t, t), float("-inf")), diagonal=1)
        out = self.dec(x, mem, tgt_mask=mask)
        return self.fc(out[-1])  # (k, V)


class RefLSTMDecoder(nn.Module):
    """Reference LSTM+attention decoder structure (models/decoderWithAttention
    per SURVEY.md C4/C5: additive attention 1024/512->512->1, gated context,
    LSTMCell(512+1024, 512), vocab head).  Dims from train.py:38-44."""

    def __init__(self, vocab, embed=512, att=512, hid=512, enc=1024):
        super().__init__()
        self.embed = nn.Embedding(vocab, embed)
        self.enc_att = nn.Linear(enc, att)
        self.dec_att = nn.Linear(hid, att)
        self.full_att = nn.Linear(att, 1)
        self.f_beta = nn.Linear(hid, enc)
        self.init_h = nn.Linear(enc, hid)
        self.init_c = nn.Linear(enc, hid)
        self.cell = nn.LSTMCell(embed + enc, hid)
        self.fc = nn.Linear(hid, vocab)

    def init_state(self, mem):
        mean = mem.mean(dim=1)
        return self.init_h(mean), self.init_c(mean)

    def step(self, words, mem, h, c):
        # One reference beam step (caption.py:94-117): additive attention,
        # sigmoid-gated context, LSTM cell, vocab scores.
        att = self.full_att(
            torch.relu(self.enc_att(mem) + self.dec_att(h).unsqueeze(1))
        ).squeeze(2)
        alpha = F.softmax(att, dim=1)
        awe = (mem * alpha.unsqueeze(2)).sum(dim=1)
        awe = torch.sigmoid(self.f_beta(h)) * awe
        h, c = self.cell(torch.cat([self.embed(words), awe], dim=1), (h, c))
        return self.fc(h), h, c


def caption_one_lstm(encoder, decoder, image, k, vocab, start_id, max_steps):
    """The reference LSTM beam loop (caption.py:39-155): k beams as a batch,
    ONE cell step per token (state carried, no prefix re-run), cumulative
    log-softmax scores, topk over k*V, beam reshuffle via prev_word_inds.
    Random weights => no <end>, so all k survive to the cap (worst case,
    matching the TPU-side bench)."""
    with torch.no_grad():
        enc = encoder(image)  # (1, 7, 7, 1024)
        mem = enc.reshape(1, -1, enc.shape[-1]).expand(k, -1, -1)
        h, c = decoder.init_state(mem)
        words = torch.full((k,), start_id, dtype=torch.long)
        cum = torch.zeros(k, 1)
        seqs = words.unsqueeze(1)
        for step in range(max_steps):
            logits, h, c = decoder.step(words, mem, h, c)
            logp = F.log_softmax(logits, dim=-1)
            cand = (cum + logp).view(-1)
            if step == 0:
                top, idx = logp[0].topk(k)
                prev = torch.zeros(k, dtype=torch.long)
            else:
                top, idx = cand.topk(k)
                prev = idx // vocab
            words = idx % vocab
            seqs = torch.cat([seqs[prev], words.unsqueeze(1)], dim=1)
            h, c = h[prev], c[prev]
            cum = top.unsqueeze(1)
        return seqs


def caption_one(encoder, decoder, image, k, vocab, start_id, max_steps):
    """The reference beam loop (caption.py:160-255): k beams as a batch,
    FULL decoder re-run on the growing prefix each step, cumulative
    log-softmax scores, topk over k*V.  Random weights => no <end> is ever
    produced, so all k beams survive to the step cap (worst case, same as
    the TPU-side bench)."""
    with torch.no_grad():
        enc = encoder(image)  # (1, 7, 7, 1024)
        mem = enc.reshape(1, -1, enc.shape[-1]).expand(k, -1, -1)
        prefix = torch.full((k, 1), start_id, dtype=torch.long)
        cum = torch.zeros(k, 1)
        for step in range(max_steps):
            logits = decoder(prefix, mem)
            logp = F.log_softmax(logits, dim=-1)
            cand = (cum + logp).view(-1)
            if step == 0:
                top, idx = logp[0].topk(k)  # step-1: beam 0 only
                prev = torch.zeros(k, dtype=torch.long)
            else:
                top, idx = cand.topk(k)
                prev = idx // vocab
            words = (idx % vocab).unsqueeze(1)
            prefix = torch.cat([prefix[prev], words], dim=1)
            cum = top.unsqueeze(1)
        return prefix


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--decoder", choices=["transformer", "lstm"],
                    default="transformer")
    args = ap.parse_args()

    torch.manual_seed(0)
    torch.set_num_threads(torch.get_num_threads())
    vocab, k, max_steps = 9490, 5, 50
    encoder = ConvNeXtBase().eval()
    if args.decoder == "lstm":
        decoder = RefLSTMDecoder(vocab).eval()
        run = caption_one_lstm
        metric = "reference_beam5_lstm_captions_per_sec"
        art_name = "reference_beam_lstm.json"
        arch = "LSTM+attention (one cell step/token)"
    else:
        decoder = RefTransformerDecoder(vocab).eval()
        run = caption_one
        metric = "reference_beam5_captions_per_sec"
        art_name = "reference_beam.json"
        arch = "6-layer transformer (full-prefix re-decode)"
    image = torch.randn(1, 3, 256, 256)

    t0 = time.perf_counter()
    run(encoder, decoder, image, k, vocab, 1, max_steps)
    warm = time.perf_counter() - t0
    print(f"[ref-beam] warmup: {warm:.1f}s", file=sys.stderr, flush=True)

    n = max(1, int(3 * 60 / max(warm, 1)))  # ~3 minutes of samples
    n = min(n, 5)
    t0 = time.perf_counter()
    for _ in range(n):
        run(encoder, decoder, image, k, vocab, 1, max_steps)
    dt = (time.perf_counter() - t0) / n
    row = {
        "metric": metric,
        "value": round(1.0 / dt, 3),
        "unit": "captions/sec",
        "sec_per_caption": round(dt, 3),
        "config": f"reference algorithm, torch CPU, ConvNeXt-Base + {arch}, "
                  "beam 5, 50 steps (no <end> with random weights; same "
                  "condition as the TPU-side beam bench)",
        "n_samples": n,
    }
    print(json.dumps(row))
    # Persist for bench_full.py's beam vs_baseline denominator, so the ratio
    # tracks this host instead of a hardcoded constant.
    art = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", art_name,
    )
    os.makedirs(os.path.dirname(art), exist_ok=True)
    with open(art, "w") as f:
        json.dump(row, f)


if __name__ == "__main__":
    main()
