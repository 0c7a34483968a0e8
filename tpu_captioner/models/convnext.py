"""ConvNeXt-Base backbone as a flax.linen module, NHWC end-to-end.

TPU-native re-design of the torchvision backbone consumed by the reference
encoder (reference models/encoder.py:18-19 keeps ``convnext_base().features``).
Structure matches torchvision's 8 feature children one-to-one so that
stage-indexed fine-tuning (models/encoder.py:29-34) and weight porting are
index-compatible:

  features_0  stem:      4x4/4 conv 3->128 + LayerNorm
  features_1  stage 1:   3 blocks, dim 128
  features_2  down:      LayerNorm + 2x2/2 conv 128->256
  features_3  stage 2:   3 blocks, dim 256
  features_4  down:      256->512
  features_5  stage 3:   27 blocks, dim 512
  features_6  down:      512->1024
  features_7  stage 4:   3 blocks, dim 1024

Each block: depthwise 7x7 conv -> LayerNorm -> Dense 4x -> GELU(exact) ->
Dense 1x -> layer-scale (init 1e-6) -> stochastic depth (row mode, total rate
0.5 linearly ramped over the 36 blocks, matching torchvision convnext_base)
-> residual add.  All LayerNorms use eps=1e-6.

NHWC everywhere: the permutes that bracket every torch block disappear, and
XLA keeps the channel axis on the 128-wide lane dimension of the MXU/VPU.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from tpu_captioner.models.torch_init import trunc_normal02
from tpu_captioner.ops.dwconv import depthwise_conv7x7_nhwc

# (depths, dims) for ConvNeXt-Base; stochastic-depth total rate 0.5.
BASE_DEPTHS = (3, 3, 27, 3)
BASE_DIMS = (128, 256, 512, 1024)
BASE_SD_RATE = 0.5
LN_EPS = 1e-6


def _layer_norm(dtype):
    # Normalize/scale in f32 for stability regardless of compute dtype.
    return nn.LayerNorm(epsilon=LN_EPS, dtype=jnp.float32, param_dtype=jnp.float32)


class DWConv7x7(nn.Module):
    """Depthwise 7x7 with nn.Conv-compatible params (kernel (7,7,1,C), bias);
    computes via the Pallas kernel (ops/dwconv.py) on TPU or XLA's grouped
    conv elsewhere."""

    dim: int
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", trunc_normal02(), (7, 7, 1, self.dim))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        y = depthwise_conv7x7_nhwc(
            x.astype(self.dtype),
            kernel.reshape(7, 7, self.dim).astype(self.dtype),
            self.use_pallas,
        )
        return y + bias.astype(self.dtype)


class _ParamHolder(nn.Module):
    """Declares {scale,bias} or {kernel,bias} leaves so both the XLA path and
    the fused Pallas path share one parameter layout (names match
    nn.LayerNorm / nn.Dense for porting and mask compatibility)."""

    shapes: tuple  # ((name, shape, init), ...)

    @nn.compact
    def __call__(self):
        return tuple(self.param(n, init, s) for n, s, init in self.shapes)


class ConvNeXtBlock(nn.Module):
    """One block; ``sd_prob`` may be a traced scalar (scanned stages pass the
    per-block stochastic-depth rate as a scan input).

    ``pallas_mode``:
      'off'   — plain XLA ops;
      'mlp'   — post-conv tail (LN -> MLP -> layer-scale -> stochastic depth
                -> residual) as ONE fused Pallas kernel (ops/mlp_block.py);
      'block' — the ENTIRE block incl. the depthwise conv as one kernel
                (ops/block_fused.py)."""

    dim: int
    deterministic: bool = True
    pallas_mode: str = "off"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, sd_prob):
        from tpu_captioner.models.layers import layer_norm
        from tpu_captioner.ops.block_fused import fused_convnext_block
        from tpu_captioner.ops.mlp_block import fused_convnext_mlp

        inp = x
        d = self.dim
        (dw_kernel, dw_bias) = _ParamHolder(
            (("kernel", (7, 7, 1, d), trunc_normal02()),
             ("bias", (d,), nn.initializers.zeros)),
            name="dwconv",
        )()
        (ln_scale, ln_bias) = _ParamHolder(
            (("scale", (d,), nn.initializers.ones),
             ("bias", (d,), nn.initializers.zeros)),
            name="LayerNorm_0",
        )()
        (w1, b1) = _ParamHolder(
            (("kernel", (d, 4 * d), trunc_normal02()),
             ("bias", (4 * d,), nn.initializers.zeros)),
            name="pw1",
        )()
        (w2, b2) = _ParamHolder(
            (("kernel", (4 * d, d), trunc_normal02()),
             ("bias", (d,), nn.initializers.zeros)),
            name="pw2",
        )()
        gamma = self.param(
            "layer_scale", nn.initializers.constant(1e-6), (d,), jnp.float32
        )

        b = x.shape[0]
        if self.deterministic:
            sd_rows = jnp.ones((b,), jnp.float32)
        else:
            # Stochastic depth, row mode (per-sample) — matches torchvision.
            key = self.make_rng("stochastic_depth")
            survival = 1.0 - sd_prob
            keep = jax.random.bernoulli(key, survival, (b,))
            sd_rows = jnp.where(keep, 1.0 / survival, 0.0)

        if self.pallas_mode == "block":
            return fused_convnext_block(
                inp.astype(self.dtype), sd_rows,
                dw_kernel.reshape(7, 7, d).astype(self.dtype), dw_bias,
                ln_scale, ln_bias,
                w1.astype(self.dtype), b1, w2.astype(self.dtype), b2, gamma,
                True,
            )

        # Depthwise conv on XLA's grouped conv (faster than the standalone
        # Pallas dwconv kernel on v5e, ops/dwconv.py kept as opt-in library).
        x = depthwise_conv7x7_nhwc(
            x.astype(self.dtype), dw_kernel.reshape(7, 7, d).astype(self.dtype), False
        ) + dw_bias.astype(self.dtype)
        # Offered to the 'save_mlp_in' remat policy (Stage below): with the
        # dwconv output saved, BOTH custom VJPs' residuals are saved values
        # or remat-boundary inputs, so the block backward replays no forward
        # compute at all (identity tag otherwise).
        x = checkpoint_name(x, "mlp_in")

        if self.pallas_mode == "mlp":
            rows = x.reshape(-1, d)
            res_rows = inp.reshape(-1, d)
            per_row = x.shape[1] * x.shape[2]
            sd_full = jnp.repeat(sd_rows, per_row)
            out = fused_convnext_mlp(
                rows, res_rows, sd_full, ln_scale, ln_bias,
                w1.astype(self.dtype), b1, w2.astype(self.dtype), b2, gamma,
                True,
            )
            return out.reshape(x.shape)

        y = layer_norm({"scale": ln_scale, "bias": ln_bias}, x, eps=LN_EPS)
        y = y.astype(self.dtype)
        y = nn.gelu(y @ w1.astype(self.dtype) + b1.astype(self.dtype), approximate=False)
        y = y @ w2.astype(self.dtype) + b2.astype(self.dtype)
        y = y * gamma.astype(self.dtype)
        y = y * sd_rows[:, None, None, None].astype(self.dtype)
        return inp + y


class Downsample(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _layer_norm(self.dtype)(x).astype(self.dtype)
        x = nn.Conv(
            self.dim_out,
            (2, 2),
            strides=(2, 2),
            dtype=self.dtype,
            kernel_init=trunc_normal02(),
            name="conv",
        )(x)
        return x


class Stem(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.dim_out,
            (4, 4),
            strides=(4, 4),
            dtype=self.dtype,
            kernel_init=trunc_normal02(),
            name="conv",
        )(x)
        x = _layer_norm(self.dtype)(x).astype(self.dtype)
        return x


class Stage(nn.Module):
    """A stack of identical-shape blocks, executed as ONE ``nn.scan`` over
    stacked parameters: the 27-block stage 3 becomes a single rolled loop in
    HLO instead of 27 inlined copies — ~10x smaller programs and far faster
    XLA compiles, with identical math (per-block stochastic-depth rates ride
    along as scan inputs; rngs split per block)."""

    dim: int
    depth: int
    sd_probs: Sequence[float]
    pallas_mode: str = "off"
    remat: str = "auto"  # 'auto' | 'on' | 'off' | 'save_mlp_in'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        def body(block, carry, sd_prob):
            return block(carry, sd_prob), None

        # Rematerialize blocks in the backward pass: the XLA path otherwise
        # keeps ~9 GB of activations alive (stage-1 MLP intermediates are
        # 268 MB each) and OOMs a 16 GB chip.  Measured: remat also WINS for
        # the fused-kernel path (157 vs 517 ms/step fine-tune — storing
        # custom-VJP residuals across the scan serializes far worse than
        # replaying forwards), so 'auto' keeps it on everywhere.
        # 'save_mlp_in' additionally saves the per-block dwconv output
        # (checkpoint_name 'mlp_in', one (B,H,W,C) tensor per block —
        # 16.8 MB f32 at stage-3 bs=32): both the dwconv and the fused-MLP
        # custom VJPs then find every residual already live, so the block
        # backward replays NO forward compute (vs 'on' replaying
        # dwconv+MLP fwd).  Round-5 fine-tune A/B under
        # artifacts/r05_queue/q_ft_remat_*.
        if self.remat in ("on", "auto", "save_mlp_in", True):
            policy = (
                jax.checkpoint_policies.save_only_these_names("mlp_in")
                if self.remat == "save_mlp_in" else None
            )
            body = nn.remat(body, prevent_cse=False, policy=policy)
        # Experimental knob (round 5): unroll>1 lets XLA interleave adjacent
        # blocks' backward/remat work across the scan-iteration boundary —
        # probing the ~10 ms/step of fine-tune scan-interleave overhead the
        # isolated floor arms don't pay (BENCHMARKING.md "Fine-tune floor").
        import os as _os

        unroll = int(_os.environ.get("TPU_CAPTIONER_STAGE_UNROLL", "1"))
        scan = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True, "stochastic_depth": True},
            in_axes=0,
            length=self.depth,
            unroll=unroll if self.depth % unroll == 0 else 1,
        )
        block = ConvNeXtBlock(
            self.dim, deterministic=deterministic, pallas_mode=self.pallas_mode,
            dtype=self.dtype, name="blocks"
        )
        x, _ = scan(block, x, jnp.asarray(self.sd_probs, jnp.float32))
        return x


class ConvNeXtFeatures(nn.Module):
    """The 8-child feature pyramid (input NHWC uint8-normalized float)."""

    depths: Sequence[int] = BASE_DEPTHS
    dims: Sequence[int] = BASE_DIMS
    sd_rate: float = BASE_SD_RATE
    # One mode for all stages, or a per-stage tuple (e.g. fused kernels for
    # the frozen forward-only stages, XLA for backward-traversed ones —
    # serialized Pallas launches in the backward scan cannot pipeline).
    pallas_mode: Any = "off"
    remat: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        total = sum(self.depths)
        sd = [self.sd_rate * i / max(total - 1.0, 1.0) for i in range(total)]
        off = 0
        x = Stem(self.dims[0], self.dtype, name="features_0")(x)
        for s, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if s > 0:
                x = Downsample(dim, self.dtype, name=f"features_{2 * s}")(x)
            mode = (
                self.pallas_mode[s]
                if isinstance(self.pallas_mode, (tuple, list))
                else self.pallas_mode
            )
            x = Stage(
                dim, depth, sd[off : off + depth], mode,
                remat=self.remat, dtype=self.dtype, name=f"features_{2 * s + 1}"
            )(x, deterministic=deterministic)
            off += depth
        return x  # (B, H/32, W/32, dims[-1])


def adaptive_avg_pool_matrix(in_size: int, out_size: int) -> jnp.ndarray:
    """(in_size, out_size) averaging matrix reproducing torch
    AdaptiveAvgPool2d bin edges: bin i spans [floor(i*S/O), ceil((i+1)*S/O))."""
    import numpy as np

    m = np.zeros((in_size, out_size), dtype=np.float32)
    for i in range(out_size):
        lo = (i * in_size) // out_size
        hi = -(-((i + 1) * in_size) // out_size)  # ceil
        m[lo:hi, i] = 1.0 / (hi - lo)
    return jnp.asarray(m)


def adaptive_avg_pool_nhwc(x: jnp.ndarray, out_hw: int) -> jnp.ndarray:
    """Adaptive average pool as two small matmuls (exact, MXU-friendly,
    no dynamic windows) — replaces nn.AdaptiveAvgPool2d (encoder.py:20)."""
    h, w = x.shape[1], x.shape[2]
    mh = adaptive_avg_pool_matrix(h, out_hw).astype(x.dtype)
    mw = adaptive_avg_pool_matrix(w, out_hw).astype(x.dtype)
    x = jnp.einsum("bhwc,hp->bpwc", x, mh)
    x = jnp.einsum("bpwc,wq->bpqc", x, mw)
    return x
