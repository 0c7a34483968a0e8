"""Cross-framework BLEU-equality artifact — ALL FOUR decoder families.

Trains a REFERENCE-architecture torch model (reduced-depth ConvNeXt encoder +
the selected decoder, mirroring models/encoder.py + models/transformerDecoder.py
/ models/decoder.py / models/lstmNoAttention.py / models/transformerDecoderAttVis.py)
on the learnable synthetic dataset on CPU, saves a reference-format
``.pth.tar`` checkpoint (utils/utils.py:195-224 payload and state-dict key
schemes), then evaluates that ONE checkpoint through BOTH stacks:

(a) torch — a transcription of the reference's test loop (test.py:144-215):
    active-row greedy re-decode (the family's forwardWithoutTeacherForcing),
    preprocessDecoderOutputForMetrics alignment (utils/utils.py:261-295),
    doubly-stochastic attention regularizer on the LSTM+attention loss
    (test.py:174-175), nltk corpus_bleu 1..4 with the reference's weights;
(b) tpu_captioner — ``cli/test.py`` with port-on-load of the .pth.tar.

Asserting BLEU-1..4 (and loss/top-5) agree certifies the entire
port -> rollout -> aligner -> BLEU chain against REAL reference training
dynamics, not just forward numerics (which tests/test_reference_checkpoint.py
already pins).

Per-family notes:
- transformer: nn.TransformerDecoder, ``transformer_decoder.layers.N`` keys.
- transformer_attvis: the attention-capture variant
  (transformerDecoderAttVis.py) — ``decoder_layers.N`` keys and, at the
  reduced size where encoder_dim == embed_dim, the ``nn.Identity``
  encoder_proj branch (transformerDecoderAttVis.py:129), exercising the
  porter's optional-encoder_proj path.
- lstm: DecoderWithAttention (decoder.py:34-172) — additive attention,
  gated context, LSTMCell, active-index greedy loop, alpha regularizer.
- lstm_no_attention: DecoderWithoutAttention (lstmNoAttention.py:13-139).

Writes artifacts to --out: test-torch.csv, the cli/test.py CSV, and
summary.json with the deltas.  Exit code 1 on mismatch.
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import torch
import torch.nn as nn
import torch.nn.functional as F
from nltk.translate.bleu_score import corpus_bleu

BASE = "synthetic_5_cap_per_img_1_min_word_freq"

# Reduced reference-architecture shapes (flagship: (3,3,27,3)/(128..1024),
# E=512, H=8, L=6, F=512 — too big to train on this 1-core host).
DEPTHS = (1, 1, 2, 1)
DIMS = (8, 16, 24, 32)
E, H, L, FFN = 32, 4, 2, 48
ATT, HID = 24, 48  # LSTM attention_dim / decoder_dim (reference: 512/512)
MAXLEN = 12  # words; encoded length 14
IMG = 64
POOL = 2  # encoded_image_size: 64 / 32 = 2
ALPHA_C = 1.0  # doubly-stochastic regularizer weight (test.py:60)


def log(msg):
    print(f"[bleu-parity] {msg}", flush=True)


# --- reference-architecture torch modules (reduced size) -------------------
class CNBlock(nn.Module):
    """torchvision CNBlock structure (what models/encoder.py:18 wraps)."""

    def __init__(self, dim):
        super().__init__()
        self.dwconv = nn.Conv2d(dim, dim, 7, padding=3, groups=dim, bias=True)
        self.ln = nn.LayerNorm(dim, eps=1e-6)
        self.pw1 = nn.Linear(dim, 4 * dim)
        self.pw2 = nn.Linear(4 * dim, dim)
        self.layer_scale = nn.Parameter(torch.full((dim, 1, 1), 1e-6))

    def forward(self, x):  # NCHW
        r = self.dwconv(x).permute(0, 2, 3, 1)
        r = self.pw2(F.gelu(self.pw1(self.ln(r))))
        return x + self.layer_scale * r.permute(0, 3, 1, 2)

    def export(self, sd, base):
        sd[f"{base}.block.0.weight"] = self.dwconv.weight
        sd[f"{base}.block.0.bias"] = self.dwconv.bias
        sd[f"{base}.block.2.weight"] = self.ln.weight
        sd[f"{base}.block.2.bias"] = self.ln.bias
        sd[f"{base}.block.3.weight"] = self.pw1.weight
        sd[f"{base}.block.3.bias"] = self.pw1.bias
        sd[f"{base}.block.5.weight"] = self.pw2.weight
        sd[f"{base}.block.5.bias"] = self.pw2.bias
        sd[f"{base}.layer_scale"] = self.layer_scale


class Encoder(nn.Module):
    """Reference Encoder (models/encoder.py:14-34) on a reduced backbone:
    features -> adaptive pool -> NHWC."""

    def __init__(self):
        super().__init__()
        self.stem_conv = nn.Conv2d(3, DIMS[0], 4, stride=4)
        self.stem_ln = nn.LayerNorm(DIMS[0], eps=1e-6)
        self.stages = nn.ModuleList()
        self.down_ln = nn.ModuleList()
        self.down_conv = nn.ModuleList()
        for s, (d, dim) in enumerate(zip(DEPTHS, DIMS)):
            if s > 0:
                self.down_ln.append(nn.LayerNorm(DIMS[s - 1], eps=1e-6))
                self.down_conv.append(nn.Conv2d(DIMS[s - 1], dim, 2, stride=2))
            self.stages.append(nn.ModuleList([CNBlock(dim) for _ in range(d)]))

    def forward(self, x):  # NCHW -> (B, POOL, POOL, DIMS[-1])
        x = self.stem_conv(x)
        x = self.stem_ln(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        for s, stage in enumerate(self.stages):
            if s > 0:
                x = self.down_ln[s - 1](x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
                x = self.down_conv[s - 1](x)
            for blk in stage:
                x = blk(x)
        x = F.adaptive_avg_pool2d(x, POOL)
        return x.permute(0, 2, 3, 1)

    def export(self):
        """torchvision 'features.*'-style keys, prefixed 'convnext.' by the
        caller (reference checkpoint scheme)."""
        sd = {
            "0.0.weight": self.stem_conv.weight,
            "0.0.bias": self.stem_conv.bias,
            "0.1.weight": self.stem_ln.weight,
            "0.1.bias": self.stem_ln.bias,
        }
        for s, stage in enumerate(self.stages):
            for b, blk in enumerate(stage):
                blk.export(sd, f"{2 * s + 1}.{b}")
            if s < len(self.stages) - 1:
                sd[f"{2 * s + 2}.0.weight"] = self.down_ln[s].weight
                sd[f"{2 * s + 2}.0.bias"] = self.down_ln[s].bias
                sd[f"{2 * s + 2}.1.weight"] = self.down_conv[s].weight
                sd[f"{2 * s + 2}.1.bias"] = self.down_conv[s].bias
        return sd


def sinusoidal_pe(max_len, dim):
    pos = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float32) * (-np.log(10000.0) / dim))
    pe = np.zeros((max_len, dim), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


class Decoder(nn.Module):
    """Reference TransformerDecoder (models/transformerDecoder.py:53-168)."""

    def __init__(self, vocab, dropout=0.1):
        super().__init__()
        self.vocab = vocab
        self.embedding = nn.Embedding(vocab, E)
        self.dropout = nn.Dropout(dropout)
        layer = nn.TransformerDecoderLayer(
            d_model=E, nhead=H, dim_feedforward=FFN, dropout=dropout
        )
        self.transformer_decoder = nn.TransformerDecoder(layer, num_layers=L)
        self.fc_out = nn.Linear(E, vocab)
        self.encoder_proj = nn.Linear(DIMS[-1], E)
        self.register_buffer("pe", torch.tensor(sinusoidal_pe(MAXLEN + 2, E)))

    def _embed(self, captions):
        # reference order: dropout THEN +PE (transformerDecoder.py:98)
        x = self.dropout(self.embedding(captions))
        return x + self.pe[: captions.shape[1]][None]

    def _project(self, enc_out):
        return self.encoder_proj(
            enc_out.reshape(enc_out.shape[0], -1, enc_out.shape[-1])
        ).permute(1, 0, 2)

    def _decode(self, tgt, mem, causal, kpm=None):
        return self.transformer_decoder(
            tgt, mem, tgt_mask=causal, tgt_key_padding_mask=kpm
        )

    def tf_forward(self, enc_out, captions, kpm):
        mem = self._project(enc_out)
        tgt = self._embed(captions).permute(1, 0, 2)
        t = tgt.shape[0]
        causal = torch.triu(torch.ones(t, t, dtype=torch.bool), diagonal=1)
        out = self._decode(tgt, mem, causal, kpm)
        return self.fc_out(out.permute(1, 0, 2))

    @torch.no_grad()
    def greedy(self, enc_out, start_id, end_id, pad_id, max_decode_len):
        """Transcription of forwardWithoutTeacherForcing
        (transformerDecoder.py:110-160, transformerDecoderAttVis.py:170-228):
        active-row slicing, full-prefix re-decode per step, pad-grown
        inputs buffer."""
        B = enc_out.shape[0]
        mem_all = self._project(enc_out)
        inputs = torch.full((B, 1), start_id, dtype=torch.long)
        predictions = torch.zeros(B, max_decode_len, self.vocab)
        sequences = torch.zeros(B, max_decode_len, dtype=torch.long)
        finished = torch.zeros(B, dtype=torch.bool)
        for t in range(max_decode_len):
            active = (~finished).nonzero(as_tuple=False).squeeze(1)
            if len(active) == 0:
                break
            tgt = self._embed(inputs[active]).permute(1, 0, 2)
            tl = tgt.shape[0]
            causal = torch.triu(torch.ones(tl, tl, dtype=torch.bool), diagonal=1)
            out = self._decode(tgt, mem_all[:, active, :], causal)
            preds = self.fc_out(out[-1])
            predictions[active, t, :] = preds
            ids = preds.argmax(-1)
            sequences[active, t] = ids
            finished[active] |= ids == end_id
            new_inputs = torch.full((B, t + 2), pad_id, dtype=torch.long)
            new_inputs[:, : t + 1] = inputs
            new_inputs[active, t + 1] = ids
            inputs = new_inputs
        return predictions, sequences, None

    def export_decoder_sd(self):
        dec_sd = {
            "embedding.weight": self.embedding.weight,
            "fc_out.weight": self.fc_out.weight,
            "fc_out.bias": self.fc_out.bias,
        }
        if not isinstance(self.encoder_proj, nn.Identity):
            dec_sd["encoder_proj.weight"] = self.encoder_proj.weight
            dec_sd["encoder_proj.bias"] = self.encoder_proj.bias
        for i, tl in enumerate(self.transformer_decoder.layers):
            b = f"transformer_decoder.layers.{i}"
            dec_sd[f"{b}.self_attn.in_proj_weight"] = tl.self_attn.in_proj_weight
            dec_sd[f"{b}.self_attn.in_proj_bias"] = tl.self_attn.in_proj_bias
            dec_sd[f"{b}.self_attn.out_proj.weight"] = tl.self_attn.out_proj.weight
            dec_sd[f"{b}.self_attn.out_proj.bias"] = tl.self_attn.out_proj.bias
            dec_sd[f"{b}.multihead_attn.in_proj_weight"] = tl.multihead_attn.in_proj_weight
            dec_sd[f"{b}.multihead_attn.in_proj_bias"] = tl.multihead_attn.in_proj_bias
            dec_sd[f"{b}.multihead_attn.out_proj.weight"] = tl.multihead_attn.out_proj.weight
            dec_sd[f"{b}.multihead_attn.out_proj.bias"] = tl.multihead_attn.out_proj.bias
            for nm in ("linear1", "linear2", "norm1", "norm2", "norm3"):
                mod = getattr(tl, nm)
                dec_sd[f"{b}.{nm}.weight"] = mod.weight
                dec_sd[f"{b}.{nm}.bias"] = mod.bias
        return dec_sd


class AttVisDecoder(Decoder):
    """Reference TransformerDecoderForAttentionViz
    (transformerDecoderAttVis.py:108-237).  The CustomTransformerDecoderLayer
    is torch's own TransformerDecoderLayer blocks consolidated (its docstring
    says so, transformerDecoderAttVis.py:34-63), so the math is the stock
    layer with attention weights also returned; we train/evaluate through the
    stock modules and export the attvis key scheme: ``decoder_layers.N`` and
    — because encoder_dim == embed_dim at this reduced size — the
    ``nn.Identity`` encoder_proj branch (transformerDecoderAttVis.py:129)."""

    def __init__(self, vocab, dropout=0.1):
        assert E == DIMS[-1], "attvis reduced config exercises Identity proj"
        super().__init__(vocab, dropout)
        self.encoder_proj = nn.Identity()

    def _project(self, enc_out):
        return enc_out.reshape(
            enc_out.shape[0], -1, enc_out.shape[-1]
        ).permute(1, 0, 2)

    def export_decoder_sd(self):
        sd = super().export_decoder_sd()
        out = {}
        for k, v in sd.items():
            if k.startswith("encoder_proj."):
                continue  # Identity: no params in the reference state dict
            out[k.replace("transformer_decoder.layers.", "decoder_layers.")] = v
        return out


class LSTMAttDecoder(nn.Module):
    """Reference DecoderWithAttention (decoder.py:34-172), reduced size.
    Module attribute names match the reference exactly so ``state_dict()``
    emits the reference key scheme (attention.encoder_att.*, decode_step.*,
    init_h/init_c/f_beta/fc/embedding)."""

    def __init__(self, vocab, dropout=0.5):
        super().__init__()
        self.vocab_size = vocab
        self.attention = nn.Module()
        self.attention.encoder_att = nn.Linear(DIMS[-1], ATT)
        self.attention.decoder_att = nn.Linear(HID, ATT)
        self.attention.full_att = nn.Linear(ATT, 1)
        self.embedding = nn.Embedding(vocab, E)
        self.dropout = nn.Dropout(p=dropout)
        self.decode_step = nn.LSTMCell(E + DIMS[-1], HID, bias=True)
        self.init_h = nn.Linear(DIMS[-1], HID)
        self.init_c = nn.Linear(DIMS[-1], HID)
        self.f_beta = nn.Linear(HID, DIMS[-1])
        self.fc = nn.Linear(HID, vocab)
        # init_weights (decoder.py:58-61)
        self.embedding.weight.data.uniform_(-0.1, 0.1)
        self.fc.bias.data.fill_(0)
        self.fc.weight.data.uniform_(-0.1, 0.1)

    def _att(self, encoder_out, h):
        # Attention.forward (decoder.py:25-31)
        att1 = self.attention.encoder_att(encoder_out)
        att2 = self.attention.decoder_att(h)
        att = self.attention.full_att(F.relu(att1 + att2.unsqueeze(1))).squeeze(2)
        alpha = F.softmax(att, dim=1)
        return (encoder_out * alpha.unsqueeze(2)).sum(dim=1), alpha

    def init_hidden_state(self, encoder_out):
        mean = encoder_out.mean(dim=1)
        return self.init_h(mean), self.init_c(mean)

    def tf_forward(self, enc_out, captions, caplens):
        """forwardWithTeacherForcing (decoder.py:69-113): sort by length,
        shrinking active batch per step."""
        B = enc_out.shape[0]
        encoder_out = enc_out.reshape(B, -1, enc_out.shape[-1])
        num_pixels = encoder_out.shape[1]
        caplens, sort_ind = caplens.sort(dim=0, descending=True)
        encoder_out = encoder_out[sort_ind]
        captions = captions[sort_ind]
        embeddings = self.embedding(captions)
        h, c = self.init_hidden_state(encoder_out)
        decode_lengths = (caplens - 1).tolist()
        maxdl = max(decode_lengths)
        predictions = torch.zeros(B, maxdl, self.vocab_size)
        alphas = torch.zeros(B, maxdl, num_pixels)
        for t in range(maxdl):
            bt = sum(1 for dl in decode_lengths if dl > t)
            awe, alpha = self._att(encoder_out[:bt], h[:bt])
            gate = torch.sigmoid(self.f_beta(h[:bt]))
            awe = gate * awe
            h, c = self.decode_step(
                torch.cat([embeddings[:bt, t, :], awe], dim=1), (h[:bt], c[:bt])
            )
            predictions[:bt, t, :] = self.fc(self.dropout(h))
            alphas[:bt, t, :] = alpha
        return predictions, captions, decode_lengths, alphas, sort_ind

    @torch.no_grad()
    def greedy(self, enc_out, start_id, end_id, pad_id, max_decode_len):
        """forwardWithoutTeacherForcing (decoder.py:119-163)."""
        B = enc_out.shape[0]
        encoder_out = enc_out.reshape(B, -1, enc_out.shape[-1])
        num_pixels = encoder_out.shape[1]
        h, c = self.init_hidden_state(encoder_out)
        inputs = self.embedding(torch.full((B,), start_id, dtype=torch.long))
        predictions = torch.zeros(B, max_decode_len, self.vocab_size)
        alphas = torch.zeros(B, max_decode_len, num_pixels)
        sequences = torch.zeros(B, max_decode_len, dtype=torch.long)
        finished = torch.zeros(B, dtype=torch.bool)
        for t in range(max_decode_len):
            active = (~finished).nonzero(as_tuple=False).squeeze(1)
            if len(active) == 0:
                break
            awe, alpha = self._att(encoder_out[active], h[active])
            gate = torch.sigmoid(self.f_beta(h[active]))
            awe = gate * awe
            h_new, c_new = self.decode_step(
                torch.cat([inputs[active], awe], dim=1), (h[active], c[active])
            )
            preds = self.fc(self.dropout(h_new))
            predictions[active, t, :] = preds
            alphas[active, t, :] = alpha
            ids = preds.argmax(dim=1)
            sequences[active, t] = ids
            finished[active] |= ids == end_id
            inputs[active] = self.embedding(ids)
            h[active] = h_new
            c[active] = c_new
        return predictions, sequences, alphas

    def export_decoder_sd(self):
        return dict(self.state_dict())


class LSTMNoAttDecoder(nn.Module):
    """Reference DecoderWithoutAttention (lstmNoAttention.py:13-139)."""

    def __init__(self, vocab, dropout=0.5):
        super().__init__()
        self.vocab_size = vocab
        self.embedding = nn.Embedding(vocab, E)
        self.dropout = nn.Dropout(p=dropout)
        self.decode_step = nn.LSTMCell(E, HID, bias=True)
        self.init_h = nn.Linear(DIMS[-1], HID)
        self.init_c = nn.Linear(DIMS[-1], HID)
        self.fc = nn.Linear(HID, vocab)
        self.embedding.weight.data.uniform_(-0.1, 0.1)
        self.fc.bias.data.fill_(0)
        self.fc.weight.data.uniform_(-0.1, 0.1)

    def init_hidden_state(self, encoder_out):
        mean = encoder_out.mean(dim=1)
        return self.init_h(mean), self.init_c(mean)

    def tf_forward(self, enc_out, captions, caplens):
        """forwardWithTeacherForcing (lstmNoAttention.py:51-86)."""
        B = enc_out.shape[0]
        encoder_out = enc_out.reshape(B, -1, enc_out.shape[-1])
        caplens, sort_ind = caplens.sort(dim=0, descending=True)
        encoder_out = encoder_out[sort_ind]
        captions = captions[sort_ind]
        embeddings = self.embedding(captions)
        h, c = self.init_hidden_state(encoder_out)
        decode_lengths = (caplens - 1).tolist()
        maxdl = max(decode_lengths)
        predictions = torch.zeros(B, maxdl, self.vocab_size)
        for t in range(maxdl):
            bt = sum(1 for dl in decode_lengths if dl > t)
            h, c = self.decode_step(embeddings[:bt, t, :], (h[:bt], c[:bt]))
            predictions[:bt, t, :] = self.fc(self.dropout(h))
        return predictions, captions, decode_lengths, None, sort_ind

    @torch.no_grad()
    def greedy(self, enc_out, start_id, end_id, pad_id, max_decode_len):
        """forwardWithoutTeacherForcing (lstmNoAttention.py:92-130)."""
        B = enc_out.shape[0]
        encoder_out = enc_out.reshape(B, -1, enc_out.shape[-1])
        h, c = self.init_hidden_state(encoder_out)
        inputs = self.embedding(torch.full((B,), start_id, dtype=torch.long))
        predictions = torch.zeros(B, max_decode_len, self.vocab_size)
        sequences = torch.zeros(B, max_decode_len, dtype=torch.long)
        finished = torch.zeros(B, dtype=torch.bool)
        for t in range(max_decode_len):
            active = (~finished).nonzero(as_tuple=False).squeeze(1)
            if len(active) == 0:
                break
            h_new, c_new = self.decode_step(inputs[active], (h[active], c[active]))
            preds = self.fc(self.dropout(h_new))
            predictions[active, t, :] = preds
            ids = preds.argmax(dim=1)
            sequences[active, t] = ids
            finished[active] |= ids == end_id
            inputs[active] = self.embedding(ids)
            h[active] = h_new
            c[active] = c_new
        return predictions, sequences, None

    def export_decoder_sd(self):
        return dict(self.state_dict())


def preprocess_for_metrics(predictions, sequences, caps, end_id, pad_id, maxlen):
    """utils/utils.py:261-295 transcription."""
    logits_list, target_list, lengths = [], [], []
    total = 0
    for i in range(predictions.shape[0]):
        seq = sequences[i]
        hits = (seq == end_id).nonzero(as_tuple=True)[0]
        n = int(hits[0]) + 1 if len(hits) else maxlen
        lengths.append(n)
        lg = predictions[i, :n, :]
        gt = caps[i, 1 : 1 + n]
        mask = gt != pad_id
        if int(mask.sum()) == 0:
            continue
        logits_list.append(lg[mask])
        target_list.append(gt[mask])
        total += int(mask.sum())
    return torch.cat(logits_list), torch.cat(target_list), total, lengths


def load_split(folder, split):
    imgs = np.load(os.path.join(folder, f"{split}_IMAGES_{BASE}.npy"), mmap_mode="r")
    caps = np.load(os.path.join(folder, f"{split}_CAPTIONS_{BASE}.npy"))
    lens = np.load(os.path.join(folder, f"{split}_CAPLENS_{BASE}.npy"))
    return imgs, caps, lens


MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)


def to_model_input(imgs_u8):
    x = imgs_u8.astype(np.float32) / 255.0
    x = (x - MEAN) / STD
    return torch.tensor(x.transpose(0, 3, 1, 2))


DECODER_CLS = {
    "transformer": Decoder,
    "transformer_attvis": AttVisDecoder,
    "lstm": LSTMAttDecoder,
    "lstm_no_attention": LSTMNoAttDecoder,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--decoder", default="transformer", choices=sorted(DECODER_CLS))
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--batch", type=int, default=20)
    args = ap.parse_args()
    dec_kind = args.decoder
    is_lstm = dec_kind in ("lstm", "lstm_no_attention")
    # VERDICT-mandated artifact directory names.
    suffix = {"transformer": "", "transformer_attvis": "_attvis",
              "lstm": "_lstm", "lstm_no_attention": "_lstm_noatt"}[dec_kind]
    if args.out is None:
        args.out = os.path.join(REPO, "artifacts", f"bleu_parity{suffix}")
    if args.workdir is None:
        args.workdir = f"/tmp/bleu_parity{suffix}"
    os.makedirs(args.out, exist_ok=True)
    torch.manual_seed(42)

    # 1) dataset ------------------------------------------------------------
    from tpu_captioner.data.build import build_synthetic_dataset
    from tpu_captioner.data.vocab import load_word_map

    if not os.path.exists(os.path.join(args.workdir, f"WORDMAP_{BASE}.json")):
        log("building learnable synthetic dataset")
        build_synthetic_dataset(
            args.workdir,
            num_images={"TRAIN": 64, "VAL": 16, "TEST": 16},
            max_len=MAXLEN, image_size=IMG, learnable=True, n_classes=8,
        )
    wm = load_word_map(os.path.join(args.workdir, f"WORDMAP_{BASE}.json"))
    V = len(wm)
    start_id, end_id, pad_id = wm["<start>"], wm["<end>"], wm["<pad>"]
    max_decode = MAXLEN + 1

    # 2) train the torch reference model ------------------------------------
    enc, dec = Encoder(), DECODER_CLS[dec_kind](V)
    imgs, caps, lens = load_split(args.workdir, "TRAIN")
    n = caps.shape[0]
    opt = torch.optim.Adam(
        list(enc.parameters()) + list(dec.parameters()), lr=args.lr
    )
    crit = nn.CrossEntropyLoss()
    enc.train(), dec.train()
    t0 = time.time()
    rng = np.random.default_rng(42)
    for ep in range(args.epochs):
        order = rng.permutation(n)
        tot, cnt = 0.0, 0
        for s in range(0, n, args.batch):
            idx = order[s : s + args.batch]
            x = to_model_input(np.asarray(imgs[idx // 5]))
            c = torch.tensor(caps[idx].astype(np.int64))
            cl = torch.tensor(lens[idx].astype(np.int64))
            eo = enc(x)
            if is_lstm:
                # reference LSTM train step (train.py:263-275): sorted TF
                # forward, pack_padded-equivalent masked CE, alpha regularizer
                # for the attention variant (train.py:269).
                preds, c_sorted, dls, alphas, _ = dec.tf_forward(eo, c, cl)
                maxdl = preds.shape[1]
                dlt = torch.tensor(dls)
                posmask = torch.arange(maxdl)[None, :] < dlt[:, None]
                loss = crit(preds[posmask], c_sorted[:, 1 : 1 + maxdl][posmask])
                if dec_kind == "lstm":
                    loss = loss + ALPHA_C * ((1.0 - alphas.sum(dim=1)) ** 2).mean()
            else:
                kpm = c == pad_id
                logits = dec.tf_forward(eo, c, kpm)
                # reference pack_padded selection: positions < caplen-1,
                # targets caps[:, 1:] (train.py:274-275)
                dl = cl - 1
                posmask = torch.arange(c.shape[1] - 1)[None, :] < dl[:, None]
                loss = crit(logits[:, :-1][posmask], c[:, 1:][posmask])
            opt.zero_grad()
            loss.backward()
            # reference clip_gradient: per-element clamp +-5 (utils:183-192)
            for p in opt.param_groups[0]["params"]:
                if p.grad is not None:
                    p.grad.data.clamp_(-5.0, 5.0)
            opt.step()
            tot += float(loss) * len(idx)
            cnt += len(idx)
        if ep % 10 == 0 or ep == args.epochs - 1:
            log(f"epoch {ep}: train loss {tot / cnt:.4f} ({time.time() - t0:.0f}s)")

    # 3) save the reference-format checkpoint --------------------------------
    enc.eval(), dec.eval()
    enc_sd = {f"convnext.{k}": v.detach().clone() for k, v in enc.export().items()}
    dec_sd = {k: v.detach().clone() for k, v in dec.export_decoder_sd().items()}
    ckpt_path = os.path.join(args.workdir, "BEST_checkpoint_parity.pth.tar")
    torch.save(
        {
            "epoch": args.epochs - 1,
            "epochsSinceImprovement": 0,
            "bleu-4": 0.0,
            "encoder": enc_sd,
            "decoder": dec_sd,
            "encoderOptimizer": None,
            "decoderOptimizer": None,
            "results": [],
        },
        ckpt_path,
    )
    log(f"saved {ckpt_path}")

    # 4) torch-side TEST eval (test.py:144-215 transcription) ----------------
    imgs, caps, lens = load_split(args.workdir, "TEST")
    n = caps.shape[0]
    B = args.batch
    references, hypotheses = [], []
    loss_sum = top5_sum = tok_sum = 0.0
    with torch.no_grad():
        for s in range(0, n, B):
            idx = np.arange(s, min(s + B, n))
            x = to_model_input(np.asarray(imgs[idx // 5]))
            c = torch.tensor(caps[idx].astype(np.int64))
            eo = enc(x)
            preds, seqs, alphas = dec.greedy(eo, start_id, end_id, pad_id, max_decode)
            lg, gt, total, dlens = preprocess_for_metrics(
                preds, seqs, c, end_id, pad_id, max_decode
            )
            loss = crit(lg, gt)
            if dec_kind == "lstm":
                # doubly-stochastic attention regularizer (test.py:174-175)
                loss = loss + ALPHA_C * ((1.0 - alphas.sum(dim=1)) ** 2).mean()
            top5 = float(
                (lg.topk(5, dim=1).indices == gt[:, None]).any(1).float().mean()
            ) * 100.0
            loss_sum += float(loss) * total
            top5_sum += top5 * total
            tok_sum += total
            for j, row in enumerate(idx):
                img_id = row // 5
                allcaps = caps[5 * img_id : 5 * img_id + 5]
                references.append(
                    [
                        [int(w) for w in cap if w not in (start_id, pad_id)]
                        for cap in allcaps
                    ]
                )
                hypotheses.append([int(w) for w in seqs[j, : dlens[j]]])
    b1 = corpus_bleu(references, hypotheses, weights=(1.0, 0, 0, 0))
    b2 = corpus_bleu(references, hypotheses, weights=(0.5, 0.5, 0, 0))
    b3 = corpus_bleu(references, hypotheses, weights=(0.33, 0.33, 0.33, 0))
    b4 = corpus_bleu(references, hypotheses, weights=(0.25, 0.25, 0.25, 0.25))
    torch_row = {
        "testLoss": loss_sum / tok_sum,
        "testTop5Acc": top5_sum / tok_sum,
        "bleu1": b1, "bleu2": b2, "bleu3": b3, "bleu4": b4,
    }
    import pandas as pd

    pd.DataFrame([torch_row]).to_csv(
        os.path.join(args.out, "test-torch.csv"), index=False
    )
    log(f"torch eval: {torch_row}")

    # 5) tpu_captioner-side eval via cli/test.py port-on-load ----------------
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1",
               PYTHONPATH=REPO)
    cmd = [
        sys.executable, "-m", "tpu_captioner.cli.test",
        "--dataFolder", args.workdir, "--dataName", BASE,
        "--checkpoint", ckpt_path, "--batchSize", str(B),
        "--decoder", dec_kind,
        "--embedDim", str(E),
        "--decoderDim", str(HID if is_lstm else FFN),
        "--maxLen", str(MAXLEN + 2), "--imageSize", str(IMG),
        "--encodedImageSize", str(POOL),
        "--encoderDepths", ",".join(map(str, DEPTHS)),
        "--encoderDims", ",".join(map(str, DIMS)),
        "--resultsDir", args.out,
    ]
    if is_lstm:
        cmd += ["--attentionDim", str(ATT)]
    else:
        cmd += ["--numLayers", str(L), "--numHeads", str(H)]
    log("running cli/test.py: " + " ".join(cmd[1:]))
    r = subprocess.run(cmd, env=env, cwd=REPO, capture_output=True, text=True)
    sys.stderr.write(r.stdout[-2000:] + r.stderr[-2000:])
    r.check_returncode()
    tpu_csv = os.path.join(args.out, f"test-{dec_kind}-Finetuning5-None.csv")
    tpu_row = pd.read_csv(tpu_csv).iloc[0].to_dict()
    log(f"tpu eval:   {tpu_row}")

    # 6) compare -------------------------------------------------------------
    deltas = {k: abs(torch_row[k] - tpu_row[k]) for k in torch_row}
    ok = all(deltas[k] <= 1e-6 for k in ("bleu1", "bleu2", "bleu3", "bleu4"))
    ok = ok and deltas["testLoss"] <= 1e-3 and deltas["testTop5Acc"] <= 0.5
    summary = {
        "decoder": dec_kind,
        "torch": torch_row, "tpu_captioner": tpu_row, "abs_deltas": deltas,
        "bleu_tolerance": 1e-6, "equal": ok,
        "config": {
            "depths": DEPTHS, "dims": DIMS, "embed_dim": E, "heads": H,
            "layers": L, "ffn": FFN, "attention_dim": ATT, "decoder_dim": HID,
            "epochs": args.epochs,
            "dataset": "learnable synthetic, TRAIN 64 / TEST 16 images",
        },
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    log(f"deltas: {deltas}")
    log("PARITY OK" if ok else "PARITY MISMATCH")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
