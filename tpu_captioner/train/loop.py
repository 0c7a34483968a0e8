"""Training driver: epoch loop, schedule, validation, results, checkpoints.

Reproduces the reference driver behavior (train.py:95-236, and the token-
weighted global metric semantics of trainMultiGPU.py:96-108):

- epoch ``fine_tune_epoch`` (20): unlock encoder children >= starting_layer
  and create a FRESH encoder Adam (train.py:161-165);
- early stop after ``early_stop_patience`` stagnant epochs; multiply both LRs
  by 0.8 whenever the stagnation count is a positive multiple of 8
  (train.py:168-174);
- per-epoch row {epoch, trainLoss, trainTop5Acc, trainBatchTime,
  trainDataTime, valLoss, valTop5Acc, bleu1..4} appended to ``results`` and
  written as a CSV (train.py:201-236);
- checkpoint every epoch with a BEST_ copy on BLEU-4 improvement
  (utils/utils.py:195-224);
- validation decodes free-running (greedy, maxDecodeLen=51), scores corpus
  BLEU-1..4 with references stripped of <start>/<pad> (keeping <end>) and
  hypotheses truncated at the first <end> inclusive (train.py:414-437).

TPU-native: meters aggregate device scalars fetched lazily at epoch end (no
per-step host sync); under a mesh the steps run data-parallel with XLA
collectives, so the "global loss reduce" of the reference is implicit.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

from tpu_captioner.core.config import ExperimentConfig
from tpu_captioner.core.prng import root_key, step_key
from tpu_captioner.data.dataset import CaptionDataset
from tpu_captioner.data.loader import ShardedLoader
from tpu_captioner.data.vocab import load_word_map, special_ids
from tpu_captioner.native.bleu_native import bleu_1_to_4
from tpu_captioner.eval.metrics import AverageMeter
from tpu_captioner.train.checkpoint import (
    checkpoint_name,
    restore_checkpoint,
    save_checkpoint,
)
from tpu_captioner.train.model import CaptionModel
from tpu_captioner.train.state import TrainState, make_optimizer, scale_lr
from tpu_captioner.train.steps import make_eval_step, make_train_step


def build_references_and_hypotheses(
    all_captions: np.ndarray,  # (B, cpi, L)
    sequences: np.ndarray,  # (B, T)
    lengths: np.ndarray,  # (B,)
    valid: np.ndarray,  # (B,)
    start_id: int,
    pad_id: int,
) -> Tuple[List[List[List[int]]], List[List[int]]]:
    """Host-side corpus assembly (train.py:414-429): references drop
    <start>/<pad> (keeping <end>/<unk>); hypotheses truncate at the decode
    length (= first <end> inclusive)."""
    references, hypotheses = [], []
    for j in range(all_captions.shape[0]):
        if not valid[j]:
            continue
        refs = []
        for cap in all_captions[j]:
            refs.append([int(w) for w in cap if w != start_id and w != pad_id])
        references.append(refs)
        hypotheses.append([int(w) for w in sequences[j, : lengths[j]]])
    return references, hypotheses


@dataclass
class Trainer:
    exp: ExperimentConfig
    data_folder: str
    data_name: str
    mesh: Any = None
    verbose: bool = True
    # Optional jax.profiler trace dir: captures a device trace of a few train
    # steps in the first epoch (upgrade over the reference's wall-clock-only
    # AverageMeters, SURVEY.md §5 tracing).
    profile_dir: Optional[str] = None

    # populated in __post_init__
    model: CaptionModel = field(init=False)
    state: TrainState = field(init=False)
    word_map: Dict[str, int] = field(init=False)
    word_ids: Dict[str, int] = field(init=False)

    def __post_init__(self):
        exp = self.exp
        self.word_map = load_word_map(
            os.path.join(self.data_folder, f"WORDMAP_{self.data_name}.json")
        )
        self.word_ids = special_ids(self.word_map)
        exp.model.vocab_size = len(self.word_map)
        self.model = CaptionModel(exp.model)
        # Eval/rollout shares the train model's encoder-kernel policy: under
        # dispatch-overhead-free measurement the fused Pallas encoder wins in
        # eval programs too (28.9 -> 18.3 ms fwd at bs=32; the round-2 "XLA
        # encoder for eval" rule was a relay measurement artifact — see
        # BENCHMARKING.md round 3).  The parameter tree is identical either
        # way, so params are shared.
        import dataclasses as _dc

        self.eval_model = CaptionModel(exp.model)
        # Fine-tune steps use the per-stage kernel policy (stage 4 on XLA);
        # params are shared, explicit per-stage configs pass through.
        from tpu_captioner.train.model import (finetune_encoder_remat,
                                               finetune_use_pallas)

        ft_up = finetune_use_pallas(exp.model.use_pallas)
        ft_remat = finetune_encoder_remat(
            exp.model.encoder_remat, exp.model.compute_dtype
        )
        if ft_up != exp.model.use_pallas or ft_remat != exp.model.encoder_remat:
            self.ft_model = CaptionModel(_dc.replace(
                exp.model, use_pallas=ft_up, encoder_remat=ft_remat))
        else:
            self.ft_model = self.model

        tc = exp.train
        self.dec_opt = make_optimizer(tc.decoder_lr, tc.grad_clip)
        self.enc_opt = make_optimizer(tc.encoder_lr, tc.grad_clip)

        pretrained = None
        if exp.model.embedding_path and os.path.exists(exp.model.embedding_path):
            from tpu_captioner.models.embeddings import load_pretrained_word_embeddings

            pretrained = load_pretrained_word_embeddings(
                self.word_map, exp.model.embedding_path, exp.model.embed_dim
            )
        params = self.model.init_params(
            root_key(tc.seed), image_size=exp.data.image_size,
            pretrained_embeddings=pretrained,
        )
        if exp.model.pretrained_encoder:
            params["encoder"]["convnext"] = self._load_backbone(
                exp.model.pretrained_encoder, params["encoder"]["convnext"]
            )
        self.state = TrainState.create(params, self.dec_opt, self.enc_opt)

        # Host bookkeeping (reference globals, train.py:47-57).
        self.start_epoch = 0
        self.best_bleu4 = 0.0
        self.epochs_since_improvement = 0
        self.results: List[Dict[str, Any]] = []
        self.fine_tune_encoder = tc.fine_tune_encoder
        self._root = root_key(tc.seed)
        self._step_cache: Dict[Tuple[bool, bool], Any] = {}

        if tc.checkpoint:
            self.state, meta = restore_checkpoint(tc.checkpoint, self.state)
            self.start_epoch = meta["epoch"] + 1
            self.epochs_since_improvement = meta["epochs_since_improvement"]
            self.best_bleu4 = meta["bleu4"]
            self.results = meta.get("results", [])
            # Re-derive fine-tune state from the epoch (train.py:128-134).
            self.fine_tune_encoder = self.start_epoch > tc.fine_tune_epoch

        # Data.
        n_shards = self.mesh.shape["data"] if self.mesh is not None else 1
        global_batch = tc.batch_size * n_shards
        self.train_loader = ShardedLoader(
            CaptionDataset(self.data_folder, self.data_name, "TRAIN"),
            global_batch, self.mesh, seed=tc.seed, shuffle=True,
        )
        self.val_loader = ShardedLoader(
            CaptionDataset(self.data_folder, self.data_name, "VAL"),
            global_batch, self.mesh, seed=tc.seed, shuffle=False,
        )

    def _load_backbone(self, path: str, init_backbone):
        """Pretrained ConvNeXt init (reference models/encoder.py:18): load,
        then validate the tree against the randomly-initialized one so a
        wrong-size checkpoint fails loudly at startup, not mid-epoch."""
        from tpu_captioner.models.port_torch import load_pretrained_backbone

        depths = tuple(self.exp.model.encoder_depths)
        try:
            loaded = load_pretrained_backbone(path, depths=depths)
        except KeyError as e:
            raise ValueError(
                f"pretrained encoder {path!r} is missing key {e} for the "
                f"configured backbone (depths={depths}) — is it a torchvision "
                "convnext state dict of the right size?"
            ) from e
        flat_init = jax.tree_util.tree_flatten_with_path(init_backbone)[0]
        flat_new = dict(jax.tree_util.tree_flatten_with_path(loaded)[0])
        problems = []
        for kp, a in flat_init:
            name = jax.tree_util.keystr(kp)
            b = flat_new.get(kp)
            if b is None:
                problems.append(f"missing {name}")
            elif tuple(a.shape) != tuple(b.shape):
                problems.append(f"{name}: shape {tuple(b.shape)} != {tuple(a.shape)}")
        if problems or len(flat_new) != len(flat_init):
            raise ValueError(
                f"pretrained encoder {path!r} does not match the configured "
                f"backbone ({len(flat_new)} vs {len(flat_init)} params): "
                + "; ".join(problems[:5])
            )
        if self.verbose:
            print(f"Initialized encoder backbone from {path}", flush=True)
        return loaded

    # -- compiled steps -----------------------------------------------------
    def _train_step(self):
        key = (self.exp.train.teacher_forcing, self.fine_tune_encoder)
        if key not in self._step_cache:
            self._step_cache[key] = make_train_step(
                self.ft_model if key[1] else self.model,
                self.exp.train, self.word_ids,
                self.dec_opt, self.enc_opt,
                teacher_forcing=key[0], train_encoder=key[1], mesh=self.mesh,
            )
        return self._step_cache[key]

    def _eval_step(self):
        if "eval" not in self._step_cache:
            self._step_cache["eval"] = make_eval_step(
                self.eval_model, self.exp.train, self.word_ids, mesh=self.mesh
            )
        return self._step_cache["eval"]

    # -- epochs -------------------------------------------------------------
    def train_epoch(self, epoch: int) -> Dict[str, float]:
        tc = self.exp.train
        step_fn = self._train_step()
        batch_time, data_time = AverageMeter(), AverageMeter()
        # Per-step metric scalars stay on-device (no per-step sync), but are
        # folded to host sums every `fold_every` batches so a COCO-scale epoch
        # (~17.7k batches x 3 scalars) never holds tens of thousands of live
        # device buffers at once.  Token weighting stays exact: we fold to
        # (sum loss*tokens, sum top5, sum tokens).
        device_metrics = []
        fold_every = 1024
        sums = {"loss_tokens": 0.0, "top5": 0.0, "tokens": 0.0}

        def _fold():
            if not device_metrics:
                return
            fetched = jax.device_get(device_metrics)
            device_metrics.clear()
            tokens = np.array([m["tokens"] for m in fetched])
            sums["loss_tokens"] += float(
                (np.array([m["loss"] for m in fetched]) * tokens).sum()
            )
            sums["top5"] += float(np.array([m["top5_correct"] for m in fetched]).sum())
            sums["tokens"] += float(tokens.sum())

        start = time.time()
        n_batches = len(self.train_loader)
        profiling = self.profile_dir is not None and epoch == self.start_epoch
        for i, batch in enumerate(self.train_loader.epoch(epoch)):
            data_time.update(time.time() - start)
            if profiling and i == 2:  # skip compile/warmup steps
                jax.profiler.start_trace(self.profile_dir)
            rng = step_key(self._root, "dropout", epoch, i)
            self.state, metrics = step_fn(self.state, batch, rng)
            if profiling and i == 6:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                profiling = False
            device_metrics.append(metrics)
            if len(device_metrics) >= fold_every:
                _fold()
            batch_time.update(time.time() - start)
            start = time.time()
            if self.verbose and i % tc.print_freq == 0:
                print(
                    f"{'TF' if tc.teacher_forcing else 'No TF'}, Epoch {epoch}, "
                    f"Batch {i + 1}/{n_batches}",
                    flush=True,
                )
        # Token-weighted epoch averages (== AverageMeter(loss, n=tokens)).
        _fold()
        total_tokens = max(sums["tokens"], 1.0)
        out = {
            "loss": sums["loss_tokens"] / total_tokens,
            "top5": 100.0 * sums["top5"] / total_tokens,
            "batch_time": batch_time.avg,
            "data_time": data_time.avg,
        }
        if self.verbose:
            print(
                f"Epoch {epoch}: Training Loss = {out['loss']:.4f}, "
                f"Top-5 Accuracy = {out['top5']:.4f}",
                flush=True,
            )
        return out

    def evaluate(self, loader: ShardedLoader, epoch: int = 0) -> Dict[str, float]:
        """Free-running evaluation with BLEU (train.py:367-441 validate /
        test.py:144-215 test)."""
        eval_step = self._eval_step()
        device_metrics = []
        references, hypotheses = [], []
        sid, pid = self.word_ids["<start>"], self.word_ids["<pad>"]
        from tpu_captioner.parallel.collectives import (
            broadcast_scalar,
            gather_eval_outputs,
            host_local_row_indices,
            host_local_rows,
            is_coordinator,
        )

        def consume(aux, batch):
            # Replicated outputs: fetch global, then keep THIS host's rows —
            # selected by the same shard indices the sharded inputs use, so
            # hypotheses stay paired with their references even if the mesh's
            # device order gives this process non-contiguous global rows.
            seqs, lengths = jax.device_get((aux["sequences"], aux["lengths"]))
            rows = host_local_row_indices(batch["valid"])
            seqs, lengths = seqs[rows], lengths[rows]
            # 'data'-sharded inputs: only this host's shards are addressable.
            all_caps = host_local_rows(batch["all_captions"])
            valid = host_local_rows(batch["valid"])
            # Multi-host: all-gather the fixed-shape outputs (replaces the
            # reference's pickle-based gather_all_data, trainMultiGPU.py:110).
            seqs, lengths, all_caps, valid = gather_eval_outputs(
                seqs, lengths, all_caps, valid
            )
            if is_coordinator():
                refs, hyps = build_references_and_hypotheses(
                    all_caps, seqs, lengths, valid, sid, pid
                )
                references.extend(refs)
                hypotheses.extend(hyps)
            device_metrics.append(
                {k: aux[k] for k in ("loss", "tokens", "top5_correct")}
            )

        # One-step software pipeline: dispatch batch i+1's eval step (async)
        # BEFORE fetching/assembling batch i on the host, so the device works
        # through the next rollout while the host builds BLEU corpora.
        prev = None
        for batch in loader.epoch(epoch):
            aux = eval_step(self.state.params, batch)
            if prev is not None:
                consume(*prev)
            prev = (aux, batch)
        if prev is not None:
            consume(*prev)
        fetched = jax.device_get(device_metrics)
        tokens = np.array([m["tokens"] for m in fetched])
        losses = np.array([m["loss"] for m in fetched])
        top5 = np.array([m["top5_correct"] for m in fetched])
        total_tokens = max(tokens.sum(), 1.0)
        if is_coordinator():
            b1, b2, b3, b4 = bleu_1_to_4(references, hypotheses)
        else:
            b1 = b2 = b3 = b4 = 0.0
        # Keep early-stopping in lockstep across hosts (trainMultiGPU.py:325).
        b1, b2, b3, b4 = (broadcast_scalar(b) for b in (b1, b2, b3, b4))
        out = {
            "loss": float((losses * tokens).sum() / total_tokens),
            "top5": float(100.0 * top5.sum() / total_tokens),
            "bleu1": b1, "bleu2": b2, "bleu3": b3, "bleu4": b4,
        }
        if self.verbose:
            print(
                f"Eval: Loss = {out['loss']:.4f}, Top-5 = {out['top5']:.4f}, "
                f"B1 = {b1:.4f}, B2 = {b2:.4f}, B3 = {b3:.4f}, B4 = {b4:.4f}",
                flush=True,
            )
        return out

    # -- full run -----------------------------------------------------------
    def run(self) -> List[Dict[str, Any]]:
        from tpu_captioner.parallel.collectives import is_coordinator

        tc = self.exp.train
        mc = self.exp.model
        for epoch in range(self.start_epoch, tc.epochs):
            if epoch == tc.fine_tune_epoch and not self.fine_tune_encoder:
                self.fine_tune_encoder = True
                self.state = self.state.reinit_encoder_optimizer(self.enc_opt)
                if self.verbose:
                    print(
                        f"Fine-tuning encoder from epoch {epoch} onwards "
                        f"(starting from layer {tc.starting_layer})",
                        flush=True,
                    )
            if self.epochs_since_improvement == tc.early_stop_patience:
                break
            if (
                self.epochs_since_improvement > 0
                and self.epochs_since_improvement % tc.lr_decay_every == 0
            ):
                self.state = self.state.replace(
                    dec_opt_state=scale_lr(self.state.dec_opt_state, tc.lr_decay_factor)
                )
                if self.fine_tune_encoder:
                    self.state = self.state.replace(
                        enc_opt_state=scale_lr(
                            self.state.enc_opt_state, tc.lr_decay_factor
                        )
                    )

            tr = self.train_epoch(epoch)
            val = self.evaluate(self.val_loader, epoch)

            self.results.append(
                {
                    "epoch": epoch,
                    "trainLoss": tr["loss"],
                    "trainTop5Acc": tr["top5"],
                    "trainBatchTime": tr["batch_time"],
                    "trainDataTime": tr["data_time"],
                    "valLoss": val["loss"],
                    "valTop5Acc": val["top5"],
                    "bleu1": val["bleu1"],
                    "bleu2": val["bleu2"],
                    "bleu3": val["bleu3"],
                    "bleu4": val["bleu4"],
                }
            )
            is_best = val["bleu4"] > self.best_bleu4
            self.best_bleu4 = max(val["bleu4"], self.best_bleu4)
            if not is_best:
                self.epochs_since_improvement += 1
                if self.verbose:
                    print(
                        f"\nEpochs since last improvement: "
                        f"{self.epochs_since_improvement}\n",
                        flush=True,
                    )
            else:
                self.epochs_since_improvement = 0

            name = checkpoint_name(
                self.data_name,
                self.model.is_lstm,
                tc.starting_layer,
                tc.encoder_lr,
                mc.embedding_name,
            )
            # Rank-0-only FILES (trainMultiGPU.py:295), but the save call is
            # collective — every process must enter it (see save_checkpoint).
            import dataclasses

            save_checkpoint(
                tc.checkpoint_dir,
                name,
                self.state,
                {
                    "epoch": epoch,
                    "epochs_since_improvement": self.epochs_since_improvement,
                    "bleu4": val["bleu4"],
                    "results": self.results,
                    # Self-describing checkpoints: consumers (cli/caption,
                    # cli/test) rebuild the exact model from this config.
                    "config": dataclasses.asdict(self.exp),
                },
                is_best=is_best,
            )
        if is_coordinator():
            self.write_results_csv()
        return self.results

    def write_results_csv(self) -> Optional[str]:
        if not self.results:
            return None
        import pandas as pd

        tc, mc = self.exp.train, self.exp.model
        os.makedirs(tc.results_dir, exist_ok=True)
        strategy = "trainingTF" if tc.teacher_forcing else "trainingNoTF"
        path = os.path.join(
            tc.results_dir,
            f"metrics-{mc.decoder}({strategy}-inferenceNoTF-"
            f"Finetuning{tc.starting_layer}-{mc.embedding_name}).csv",
        )
        pd.DataFrame(self.results).to_csv(path, index=False)
        return path
