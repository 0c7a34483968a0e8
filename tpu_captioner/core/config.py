"""Configuration dataclasses for the whole framework.

The reference scatters its knobs between module-level constants and argparse
flags (reference train.py:34-72, trainMultiGPU.py:40-87, test.py:47-81).
Here every knob lives in one typed config tree with the same names/semantics
and defaults, overridable from the CLI.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional


# Embedding-name -> (embed_dim, default artifact path) switch, mirroring
# reference train.py:74-79.  The artifact is a pre-extracted .npz (see
# tpu_captioner/models/embeddings.py) rather than a gensim binary.
EMBEDDING_PRESETS = {
    "word2vec-google-news-300": (300, "wordEmbeddings/word2vec-google-news-300.npz"),
    "glove-wiki-gigaword-200": (200, "wordEmbeddings/glove-wiki-gigaword-200.npz"),
}

DECODER_TYPES = ("lstm", "lstm_no_attention", "transformer", "transformer_attvis")


@dataclass
class DataConfig:
    """Dataset-builder and loader knobs (reference createInputFiles.py:7-13,
    train.py:35-36, dataLoader.py)."""

    dataset: str = "coco"  # 'coco' | 'flickr8k' | 'flickr30k'
    karpathy_json_path: str = ""
    image_folder: str = ""
    captions_per_image: int = 5
    min_word_freq: int = 5
    output_folder: str = "inputFiles"
    max_len: int = 50  # words; encoded length is max_len + 2 (start/end)
    image_size: int = 256

    # Loader knobs.
    batch_size: int = 32  # per data-parallel shard (reference train.py:50)
    shuffle_seed: int = 42  # DistributedSampler seed (trainMultiGPU.py:240)
    prefetch: int = 2  # device prefetch depth (replaces 6 torch workers)
    num_workers: int = 6  # host-side decode threads

    @property
    def base_name(self) -> str:
        # Identical naming scheme to reference utils/utils.py:90.
        return (
            f"{self.dataset}_{self.captions_per_image}_cap_per_img_"
            f"{self.min_word_freq}_min_word_freq"
        )


@dataclass
class ModelConfig:
    """Model hyperparameters (reference train.py:38-44 plus per-decoder
    constructor defaults)."""

    decoder: str = "transformer"  # one of DECODER_TYPES
    vocab_size: int = 0  # filled from the word map
    embed_dim: int = 512
    attention_dim: int = 512  # LSTM additive-attention width (train.py:40)
    decoder_dim: int = 512  # LSTM hidden size / transformer FFN width
    dropout: float = 0.5
    encoder_dim: int = 1024  # ConvNeXt-Base final channels (encoder.py:24)
    encoded_image_size: int = 7  # adaptive-pool target (encoder.py:15)
    # Backbone size (ConvNeXt-Base by default; overridable for tests/smaller
    # variants).  encoder_dim must equal encoder_dims[-1].
    encoder_depths: tuple = (3, 3, 27, 3)
    encoder_dims: tuple = (128, 256, 512, 1024)
    num_heads: int = 8  # forced to 6 for 300-dim word2vec (transformerDecoder.py:62-64)
    num_layers: int = 6
    max_len: int = 52  # padded caption length (train.py:44)
    embedding_name: Optional[str] = None  # key into EMBEDDING_PRESETS
    embedding_path: Optional[str] = None
    # Pretrained ConvNeXt backbone init (reference models/encoder.py:18 uses
    # torchvision IMAGENET1K_V1).  Path to a torchvision convnext state dict
    # (.pth/.pth.tar) or a pre-converted .npz (build_data port-backbone).
    pretrained_encoder: Optional[str] = None
    fine_tune_embeddings: bool = True  # train.py:109

    # Numerics: parity mode computes in f32 end-to-end; fast mode runs the
    # encoder/decoder matmuls in bf16 on the MXU with f32 accumulation.
    compute_dtype: str = "float32"  # 'float32' | 'bfloat16'
    # Pallas kernels for the hot encoder ops: 'auto' enables them on TPU
    # backends only (CPU tests run the XLA fallbacks).
    use_pallas: str = "auto"  # 'auto' | 'on' | 'off'
    # Fused Pallas decode-step kernel for deterministic transformer rollout
    # (ops/decode_step.py): 'auto' -> on TPU only; dropout-active rollouts
    # always use the XLA path regardless.
    decode_kernel: str = "auto"  # 'auto' | 'on' | 'off'
    # Rematerialize ConvNeXt blocks in the backward pass ('auto' keeps it on;
    # see models/convnext.py Stage for the measured trade-offs).
    # 'save_mlp_in' keeps remat on but saves each block's dwconv output so
    # the backward replays no forward compute (fine-tune lever, round 5).
    encoder_remat: str = "auto"  # 'auto' | 'on' | 'off' | 'save_mlp_in'
    # Dropout mask source for TF train steps: 'pool' generates the whole
    # step's ~30M mask bits in ONE hardware-PRNG Pallas launch
    # (ops/dropout_mask.py) instead of ~38 per-site threefry draws
    # (~2 ms/step); 'auto' -> pool on TPU, threefry elsewhere.  Pool masks
    # are distribution-identical but a different stream than threefry's.
    dropout_masks: str = "auto"  # 'auto' | 'pool' | 'threefry'

    def __post_init__(self):
        if self.decoder not in DECODER_TYPES:
            raise ValueError(f"decoder must be one of {DECODER_TYPES}, got {self.decoder!r}")
        if self.embedding_name is not None and self.embedding_name in EMBEDDING_PRESETS:
            dim, path = EMBEDDING_PRESETS[self.embedding_name]
            self.embed_dim = dim
            if self.embedding_path is None:
                self.embedding_path = path
            # 300 % 8 != 0, so word2vec runs with 6 heads (transformerDecoder.py:62-64).
            if self.embedding_name == "word2vec-google-news-300":
                self.num_heads = 6

    @property
    def num_pixels(self) -> int:
        return self.encoded_image_size * self.encoded_image_size


@dataclass
class TrainConfig:
    """Training-loop knobs (reference train.py:46-58, trainMultiGPU.py:50-61)."""

    epochs: int = 120
    batch_size: int = 32  # per shard
    decoder_lr: float = 1e-4
    encoder_lr: float = 1e-4
    grad_clip: float = 5.0  # elementwise clamp, not norm clip (utils/utils.py:183-192)
    alpha_c: float = 1.0  # doubly-stochastic attention regularizer (train.py:55)
    # Apply the doubly-stochastic regularizer to the attention-capture
    # transformer's cross-attention maps as well.  The reference carries this
    # as commented-out hooks (trainMultiGPU.py:373,379,453,456); here it is a
    # first-class switch (off by default, matching the reference's runs).
    attvis_regularization: bool = False
    teacher_forcing: bool = True
    # Scheduled sampling (Bengio et al. 2015): probability of feeding the
    # ground-truth token during free-running TRAINING rollouts.  0.0 = the
    # reference's pure free-running mode; only used when teacher_forcing is
    # False.  (Capability called out in the rebuild north star.)
    scheduled_sampling_prob: float = 0.0
    max_decode_len: int = 51  # free-running rollout cap (train.py:329)
    fine_tune_epoch: int = 20  # encoder unlock epoch (train.py:161)
    starting_layer: int = 5  # first trainable ConvNeXt child (train.py:63)
    fine_tune_encoder: bool = False  # pre-unlock state (train.py:58)
    lr_decay_factor: float = 0.8  # adjust_learning_rate shrink (train.py:172)
    lr_decay_every: int = 8  # stagnant epochs between decays (train.py:171)
    early_stop_patience: int = 20  # 40 in the multi-GPU driver (trainMultiGPU.py:260)
    seed: int = 42
    print_freq: int = 100
    checkpoint: Optional[str] = None  # resume path
    results_dir: str = "results"
    checkpoint_dir: str = "checkpoints"

    def __post_init__(self):
        # bs=48 is a measured throughput cliff on v5e (633 img/s vs 1072 at
        # bs=32 and 1008 at bs=64 in the shipping-default table) that no
        # scoped-VMEM limit fixes and that power-of-two batches never see —
        # see BENCHMARKING.md "Batch-size scaling, root-caused".  Warn loudly
        # rather than silently eating ~40% of the chip.
        if self.batch_size == 48:
            import warnings

            warnings.warn(
                "batch_size=48 hits a measured XLA-tiling throughput cliff "
                "on TPU v5e (~633 img/s vs ~1008 at batch_size=64; "
                "BENCHMARKING.md 'Batch-size scaling'). Use 32 or 64.",
                stacklevel=2,
            )


@dataclass
class ExperimentConfig:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    # Parallelism: size of the 'data' mesh axis; 0 = use all local devices.
    num_devices: int = 0

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, s: str) -> "ExperimentConfig":
        raw = json.loads(s)
        return cls(
            data=DataConfig(**raw.get("data", {})),
            model=ModelConfig(**raw.get("model", {})),
            train=TrainConfig(**raw.get("train", {})),
            num_devices=raw.get("num_devices", 0),
        )
