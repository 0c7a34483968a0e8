"""tpu_captioner — a TPU-native (JAX/XLA/Pallas/pjit) image-captioning framework.

Re-implements the full capability surface of the reference PyTorch repo
``sa06840/ImageCaptioningConvNeXt`` (ConvNeXt-Base encoder + four decoder
families trained on MS COCO 2014 / Flickr8k) as an idiomatic JAX framework:

- ``data``      — dataset builder (vocab + packed records) and a sharded,
                  double-buffered host loader (reference: createInputFiles.py,
                  dataLoader.py).
- ``models``    — ConvNeXt-Base encoder, LSTM decoders (with/without soft
                  attention), Transformer decoder with optional attention
                  capture (reference: models/*.py), all as flax.linen modules
                  driven by ``lax.scan``-based fixed-shape decode loops.
- ``ops``       — Pallas TPU kernels for the hot ops (fused ConvNeXt block,
                  fused additive attention).
- ``train``     — jitted teacher-forcing / free-running train steps, masked
                  losses reproducing pack_padded_sequence semantics, staged
                  encoder fine-tuning, Orbax checkpointing (reference:
                  train.py, trainMultiGPU.py, utils/utils.py).
- ``eval``      — metric aligner, top-k accuracy, pure-Python corpus BLEU
                  matching nltk (reference: utils/utils.py, test.py).
- ``infer``     — KV-cached jitted greedy and beam-search decoding with
                  attention-map extraction (reference: caption.py).
- ``parallel``  — mesh construction and shard_map data-parallel train steps
                  over ICI, replacing the reference's DDP/NCCL path
                  (reference: trainMultiGPU.py).
"""

__version__ = "0.1.0"
