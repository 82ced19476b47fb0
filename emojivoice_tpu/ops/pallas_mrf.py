"""Fused HiFi-GAN MRF stage as a Pallas TPU kernel.

One upsample stage of the generator runs 3 parallel res-blocks × 3
dilation units × 2 convs = 18 convolutions plus activations, each a
separate HBM round trip under plain XLA (~GBs of traffic per utterance at
waveform resolution).  This kernel keeps a time tile (+halo) resident in
VMEM and runs the ENTIRE multi-receptive-field fusion on it:

  out = mean_r rb_r(x),   rb: for d in dils: x += conv1(leaky(conv_d(leaky(x))))

Convs are computed as Σ_taps shift(x) @ W[tap] — k matmuls on the MXU per
conv; halo validity is tracked statically (max total receptive growth per
side is Σ_d (pad_d + pad_1) over the largest res-block, 60 frames for the
v1 kernels).  Tiles overlap by the halo via manual HBM→VMEM DMA (BlockSpec
partitions cannot overlap).

Numerics are pinned against the flax res-block composition in
tests/test_pallas_mrf.py (interpret mode) and verified on real v5e.

Lane packing is what makes the fusion pay: the kernel pads channels to the
128-wide lanes, so at the narrow waveform-rate stages (C=64/32) multiple
independent sequences share one matmul via block-diagonal tap weights —
batch items when B divides 128//C (mrf_stage_pallas_packed), overlapping
time chunks of a single sequence otherwise (mrf_stage_pallas_timesplit).
Measured on v5e (v1 generator, 512 mel frames, hifigan_apply_pallas
stages="auto"): batch-1 6.9 ms vs 10.3 XLA (-33%), batch-8 43.2 vs 51.1
(-15%).  SynthesisPipeline uses this path on real TPUs by default.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1


def _halo(kernel_sizes: Sequence[int], dilation_sizes: Sequence[Sequence[int]]) -> int:
    h = 0
    for k, dils in zip(kernel_sizes, dilation_sizes):
        total = 0
        for d in dils:
            total += (k * d - d) // 2  # dilated conv pad
            total += (k - 1) // 2      # following dilation-1 conv pad
        h = max(h, total)
    return h


def _shift(x: jnp.ndarray, off: int) -> jnp.ndarray:
    """x[(t + off)] with garbage wrapping confined to the invalid margins.

    pltpu.roll requires a non-negative shift; negative offsets roll by
    L - off (equivalent modulo the tile length)."""
    if off == 0:
        return x
    shift = (-off) % x.shape[0]
    return pltpu.roll(x, shift, 0)


def _conv_same(x, w, b, dilation: int, maskv=None):
    """'same' conv on a (L, C) tile via tap-shifted MXU matmuls.

    maskv zeroes positions outside the true array — replicating the
    per-layer zero padding of a chain of standalone 'same' convs.

    MXU precision follows the WEIGHT dtype: bf16 weights run single-pass
    bf16×bf16→f32 matmuls (the activation is cast to match), f32 weights
    the default multi-pass f32 emulation.  Accumulation and everything
    around the dots (bias, residual, activations) stays f32 either way."""
    if maskv is not None:
        x = x * maskv
    k = w.shape[0]
    half = k // 2
    acc = None
    for j in range(k):
        off = (j - half) * dilation
        # shift in f32, cast at the dot: pltpu.roll on bf16 (16,128)-tiled
        # sublanes is what Mosaic rejects, the cast itself is fine
        term = jnp.dot(_shift(x, off).astype(w.dtype), w[j],
                       preferred_element_type=jnp.float32)
        acc = term if acc is None else acc + term
    return acc + b


def _mrf_kernel_body(x_tile, stacked, kernel_sizes, dilation_sizes, maskv=None):
    """Pure-value MRF compute on a (L, C) tile."""
    out = None
    for r, (k, dils) in enumerate(zip(kernel_sizes, dilation_sizes)):
        w1, b1, w2, b2 = stacked[r]
        cur = x_tile
        for di, d in enumerate(dils):
            t = jax.nn.leaky_relu(cur, LRELU_SLOPE)
            t = _conv_same(t, w1[di], b1[di], d, maskv)
            t = jax.nn.leaky_relu(t, LRELU_SLOPE)
            t = _conv_same(t, w2[di], b2[di], 1, maskv)
            cur = cur + t
        out = cur if out is None else out + cur
    return out / len(kernel_sizes)


def _resblock_pallas(x, rb_weights, k: int, dils, t_tile: int, interpret: bool,
                     group_c: int = 0, chunk: int = 0, stage_halo: int = 0,
                     t_true: int | None = None):
    """One fused res-block (2·len(dils) convs + activations) as a Pallas call.

    x: (B, T, C) with C already 128-aligned.  Per-call VMEM footprint is one
    res-block's weights (≤ ~4.3 MB at C=128, k=11) + the tile.

    Time-split mode (chunk > 0): each lane group of ``group_c`` channels
    carries a different time chunk of the same sequence (see
    mrf_stage_pallas_timesplit), so the per-layer validity mask maps each
    lane group to its own global time range — lane group j's local position
    l sits at global position j*chunk + l - stage_halo of a ``t_true``-long
    sequence.  All offsets are static; the mask is iota arithmetic."""
    b, t, c = x.shape
    halo = sum((k * d - d) // 2 + (k - 1) // 2 for d in dils)
    t_tile = min(t_tile, t)
    nt = -(-t // t_tile)
    t_pad = nt * t_tile
    xp = jnp.pad(x, ((0, 0), (halo, halo + t_pad - t), (0, 0)))
    L = t_tile + 2 * halo
    tt = t if t_true is None else t_true

    def kernel(x_hbm, w1, b1, w2, b2, o_ref, scratch, sem):
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        cp = pltpu.make_async_copy(x_hbm.at[bi, pl.ds(ti * t_tile, L), :], scratch, sem)
        cp.start()
        cp.wait()
        # positions outside the true [0, t) range act as zeros at every
        # conv input, like per-layer zero padding in the unfused stack
        gpos = ti * t_tile - halo + jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
        if chunk:
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
            gpos = gpos + (lane // group_c) * chunk - stage_halo
        maskv = ((gpos >= 0) & (gpos < tt)).astype(jnp.float32)
        cur = scratch[...]
        for di, d in enumerate(dils):
            h = jax.nn.leaky_relu(cur, LRELU_SLOPE)
            h = _conv_same(h, w1[di], b1[di], d, maskv)
            h = jax.nn.leaky_relu(h, LRELU_SLOPE)
            h = _conv_same(h, w2[di], b2[di], 1, maskv)
            cur = cur + h
        o_ref[...] = cur[halo : halo + t_tile, :]

    out = pl.pallas_call(
        kernel,
        grid=(b, nt),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((None, t_tile, c), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((L, c), jnp.float32), pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(xp, *rb_weights)
    return out[:, :t, :]


def mrf_stage_pallas(
    x: jnp.ndarray,
    weights,
    kernel_sizes: Tuple[int, ...],
    dilation_sizes: Tuple[Tuple[int, ...], ...],
    t_tile: int = 2048,
    interpret: bool = False,
    compute_dtype=jnp.float32,
    group_c: int = 0,
    chunk: int = 0,
    stage_halo: int = 0,
    t_true: int | None = None,
) -> jnp.ndarray:
    """x (B, T, C) → fused MRF output (B, T, C): one fused Pallas call per
    res-block (bounded VMEM), summed and averaged.

    weights: per res-block tuples (w1 (n_d, k, C, C), b1 (n_d, C),
    w2 (n_d, k, C, C), b2 (n_d, C)) in channels-last layout.

    compute_dtype=bf16 runs the tap matmuls single-pass on the MXU
    (weights cast once here, activations at the dot); biases, residual
    adds and activations stay f32.  Measured on v5e at flagship dims it is
    perf-neutral (b1 11.25 ms vs 10.7-11.0 f32, b8 47.9 vs 47.3-47.8):
    the fused stages stream f32 activations and are bandwidth-, not
    MXU-bound.  Kept as an opt-in for wider-channel configs; wav max-abs
    error vs f32 is ~5.6e-4 on the tanh-bounded output (~-65 dB).
    """
    b, t, c_in = x.shape
    if compute_dtype != jnp.float32:
        weights = [(w1.astype(compute_dtype), b1, w2.astype(compute_dtype), b2)
                   for (w1, b1, w2, b2) in weights]
    # Mosaic DMA slices need the lane dim 128-aligned; pad channels up.
    # On the 128-wide MXU this costs no extra cycles for c_in ≤ 128.
    c = max(128, -(-c_in // 128) * 128)
    if c != c_in:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, c - c_in)))
        weights = [
            tuple(
                jnp.pad(w, ((0, 0), (0, 0), (0, c - c_in), (0, c - c_in))) if w.ndim == 4
                else jnp.pad(w, ((0, 0), (0, c - c_in)))
                for w in rb
            )
            for rb in weights
        ]
    out = None
    for rb, k, dils in zip(weights, kernel_sizes, dilation_sizes):
        y = _resblock_pallas(x, rb, k, tuple(dils), t_tile, interpret,
                             group_c=group_c, chunk=chunk,
                             stage_halo=stage_halo, t_true=t_true)
        out = y if out is None else out + y
    out = out / len(kernel_sizes)
    return out[:, :, :c_in]


def _block_diag_taps(w: jnp.ndarray, g: int) -> jnp.ndarray:
    """(n_d, k, C, C) → (n_d, k, gC, gC) with g copies of each tap's weight on
    the block diagonal: lane-group i of the input maps only to lane-group i of
    the output, so g independent sequences share one matmul."""
    n_d, k, c, _ = w.shape
    eye = jnp.eye(g, dtype=w.dtype)
    out = jnp.einsum("ij,dkab->dkiajb", eye, w)
    return out.reshape(n_d, k, g * c, g * c)


def _pack_lanes(x: jnp.ndarray, g: int) -> jnp.ndarray:
    """(B, T, C) → (B/g, T, gC): groups of g consecutive batch items ride the
    lane dimension of one kernel row."""
    b, t, c = x.shape
    return x.reshape(b // g, g, t, c).transpose(0, 2, 1, 3).reshape(b // g, t, g * c)


def _unpack_lanes(x: jnp.ndarray, g: int, c: int) -> jnp.ndarray:
    bg, t, gc = x.shape
    return x.reshape(bg, t, g, c).transpose(0, 2, 1, 3).reshape(bg * g, t, c)


def mrf_stage_pallas_packed(
    x: jnp.ndarray,
    weights,
    kernel_sizes: Tuple[int, ...],
    dilation_sizes: Tuple[Tuple[int, ...], ...],
    t_tile: int = 2048,
    interpret: bool = False,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Lane-packed MRF stage: batch items share the 128-wide MXU lanes.

    At the late HiFi-GAN stages (C=64, C=32) the plain kernel pads channels
    up to 128 and wastes 2-4× of every matmul; here g = 128//C batch items
    are packed into the lane dim with block-diagonal tap weights, so the
    same (L,128)@(128,128) matmul serves g sequences.  Time shifts, halos
    and the validity mask are shared (all items ride one padded bucket, as
    in the fused program), so the single-item kernel runs unchanged.

    Falls back to time-split packing (chunks of ONE sequence share the
    lanes) when B % g != 0 — notably batch 1, the single-stream path — and
    to the unpacked kernel when C ≥ 128.
    """
    b, t, c = x.shape
    g = max(1, 128 // c)
    if g == 1:
        return mrf_stage_pallas(x, weights, kernel_sizes, dilation_sizes,
                                t_tile=t_tile, interpret=interpret,
                                compute_dtype=compute_dtype)
    if b % g != 0:
        return mrf_stage_pallas_timesplit(x, weights, kernel_sizes, dilation_sizes,
                                          t_tile=t_tile, interpret=interpret,
                                          compute_dtype=compute_dtype)
    xp = _pack_lanes(x, g)
    wp = [
        (_block_diag_taps(w1, g), jnp.tile(b1, (1, g)),
         _block_diag_taps(w2, g), jnp.tile(b2, (1, g)))
        for (w1, b1, w2, b2) in weights
    ]
    out = mrf_stage_pallas(xp, wp, kernel_sizes, dilation_sizes,
                           t_tile=t_tile, interpret=interpret,
                           compute_dtype=compute_dtype)
    return _unpack_lanes(out, g, c)


def mrf_stage_pallas_timesplit(
    x: jnp.ndarray,
    weights,
    kernel_sizes: Tuple[int, ...],
    dilation_sizes: Tuple[Tuple[int, ...], ...],
    t_tile: int = 2048,
    interpret: bool = False,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Time-split lane packing: chunks of ONE sequence share the MXU lanes.

    Batch packing needs B ≥ 128//C items; single-stream synthesis (B=1) at
    the narrow waveform-rate stages (C=32/64) would waste 2-4× of every
    matmul on channel padding.  Here each item's time axis is cut into
    s = 128//C chunks, overlapped by the stage receptive field
    (`_halo`, 60 frames for the v1 kernels), and the chunks ride the lane
    dim with block-diagonal weights.  Exactness: every kept position is
    ≥ halo frames from its chunk edge, so its full receptive cone sees true
    overlap data; per-layer zero padding at the REAL sequence edges is
    reproduced by the kernel's validity mask, which maps lane group j to
    global positions j*chunk + l - halo (see _resblock_pallas).  Numerics
    equal the unsplit kernel bit-for-bit paths aside (tests pin vs flax).

    Overhead: 2*halo/chunk extra compute (~0.4% at T=131072, s=4).
    """
    b, t, c = x.shape
    s = max(1, 128 // c)
    hs = _halo(kernel_sizes, dilation_sizes)
    chunk = -(-t // s)
    if s == 1 or chunk <= 2 * hs:  # too short to pay for the overlap
        return mrf_stage_pallas(x, weights, kernel_sizes, dilation_sizes,
                                t_tile=t_tile, interpret=interpret,
                                compute_dtype=compute_dtype)
    xp = jnp.pad(x, ((0, 0), (hs, hs + s * chunk - t), (0, 0)))
    xg = jnp.concatenate(
        [xp[:, j * chunk: j * chunk + chunk + 2 * hs, :] for j in range(s)],
        axis=-1)  # (b, chunk+2hs, s*c): lane group j = chunk j
    wp = [
        (_block_diag_taps(w1, s), jnp.tile(b1, (1, s)),
         _block_diag_taps(w2, s), jnp.tile(b2, (1, s)))
        for (w1, b1, w2, b2) in weights
    ]
    out = mrf_stage_pallas(xg, wp, kernel_sizes, dilation_sizes,
                           t_tile=t_tile, interpret=interpret,
                           compute_dtype=compute_dtype,
                           group_c=c, chunk=chunk, stage_halo=hs, t_true=t)
    o = out[:, hs:hs + chunk, :].reshape(b, chunk, s, c)
    return o.transpose(0, 2, 1, 3).reshape(b, s * chunk, c)[:, :t, :]


def stack_resblock_weights(params: dict, num_kernels: int, stage: int, n_dils: Sequence[int]):
    """Collect flax HiFiGANGenerator params for one upsample stage into the
    stacked layout mrf_stage_pallas expects."""
    out = []
    for j in range(num_kernels):
        rb = params["params"][f"resblocks_{stage * num_kernels + j}"]
        nd = n_dils[j]
        w1 = jnp.stack([rb[f"convs1_{i}"]["kernel"] for i in range(nd)])
        b1 = jnp.stack([rb[f"convs1_{i}"]["bias"] for i in range(nd)])
        w2 = jnp.stack([rb[f"convs2_{i}"]["kernel"] for i in range(nd)])
        b2 = jnp.stack([rb[f"convs2_{i}"]["bias"] for i in range(nd)])
        out.append((w1, b1, w2, b2))
    return out


def _max_resblock_weight_bytes(cfg, c: int) -> int:
    c_eff = max(128, -(-c // 128) * 128)  # kernel pads channels to 128
    worst = 0
    for k, dils in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
        worst = max(worst, 2 * len(dils) * k * c_eff * c_eff * 4)
    return worst


def mrf_stage_unfused(cfg, p: dict, x: jnp.ndarray, stage: int) -> jnp.ndarray:
    """Reference (unfused) MRF stage: the generator's res-block math as plain
    XLA convs — the fallback when a stage doesn't fit VMEM or the policy says
    XLA, and the oracle the bench tools time against the fused kernel."""
    from emojivoice_tpu.ops.convs import conv1d

    num_kernels = len(cfg.resblock_kernel_sizes)
    out = None
    for j, (k, dils) in enumerate(zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)):
        rb = p[f"resblocks_{stage * num_kernels + j}"]
        cur = x
        for di, d in enumerate(dils):
            t_ = jax.nn.leaky_relu(cur, LRELU_SLOPE)
            t_ = conv1d(t_, rb[f"convs1_{di}"]["kernel"], rb[f"convs1_{di}"]["bias"],
                        padding=(k * d - d) // 2, dilation=d)
            t_ = jax.nn.leaky_relu(t_, LRELU_SLOPE)
            t_ = conv1d(t_, rb[f"convs2_{di}"]["kernel"], rb[f"convs2_{di}"]["bias"],
                        padding=(k - 1) // 2)
            cur = cur + t_
        out = cur if out is None else out + cur
    return out / num_kernels


def hifigan_apply_pallas(cfg, params: dict, mel: jnp.ndarray, t_tile: int = 2048,
                         interpret: bool = False, vmem_budget: int = 12 * 1024 * 1024,
                         compute_dtype=jnp.float32, stages="auto") -> jnp.ndarray:
    """Functional HiFi-GAN generator forward with fused-MRF stages.

    `stages` picks the backend per upsample stage:
      - "auto" (default): fuse where it measured faster than XLA's own conv
        fusion on v5e (512 mel frames, v1 generator): at B=1 fuse every
        fitting stage (time-split lane packing: 6.9 ms vs 10.3 XLA, −33%);
        at larger batches fuse only C ≤ 32 (B=8: 43.2 ms vs 51.1 XLA vs
        47.8 fuse-all).  XLA is strong where channels fill the 128 lanes;
        the fusion pays where channel padding would otherwise waste the
        MXU, and at B=1 where XLA's conv batching has nothing to batch.
      - "all": fuse every stage whose weights fit in VMEM.
      - a sequence of bools, one per upsample stage, for explicit control.
    Stages whose stacked weights don't fit in VMEM always fall back to the
    unfused res-block math.  Numerics equal vocoder.HiFiGANGenerator on
    the shared param tree whatever the policy (tests pin this).

    compute_dtype=bf16 applies only to the fused MRF tap matmuls (see
    mrf_stage_pallas); the pre/post/upsample convs and any unfused stages
    stay f32.
    """
    from emojivoice_tpu.ops.convs import conv1d, conv_transpose1d

    p = params["params"]
    num_kernels = len(cfg.resblock_kernel_sizes)
    n_dils = [len(d) for d in cfg.resblock_dilation_sizes]

    if isinstance(stages, str):
        if stages not in ("auto", "all"):
            raise ValueError(
                f"stages={stages!r}: expected 'auto', 'all', or a per-stage "
                f"bool sequence of length {len(cfg.upsample_rates)}"
            )
    elif len(stages) != len(cfg.upsample_rates):
        raise ValueError(
            f"stages has {len(stages)} entries for {len(cfg.upsample_rates)} "
            "upsample stages"
        )

    x = conv1d(mel, p["conv_pre"]["kernel"], p["conv_pre"]["bias"], padding=3)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        up = p[f"ups_{i}"]
        x = conv_transpose1d(x, up["kernel"], up["bias"], stride=u, padding=(k - u) // 2)
        c = x.shape[-1]
        c_eff = max(128, -(-c // 128) * 128)
        # budget must cover one res-block's weights + input tile + the
        # kernel's live temporaries (~4 tile-sized arrays in the conv chain)
        scratch_bytes = 5 * (t_tile + 200) * c_eff * 4
        fits = _max_resblock_weight_bytes(cfg, c) + scratch_bytes <= vmem_budget
        if stages == "auto":
            want = mel.shape[0] == 1 or 128 // c >= 4
        elif stages == "all":
            want = True
        else:
            want = bool(stages[i])
        if fits and want:
            weights = stack_resblock_weights(params, num_kernels, i, n_dils)
            x = mrf_stage_pallas_packed(x, weights, cfg.resblock_kernel_sizes,
                                        tuple(tuple(d) for d in cfg.resblock_dilation_sizes),
                                        t_tile=t_tile, interpret=interpret,
                                        compute_dtype=compute_dtype)
        else:
            x = mrf_stage_unfused(cfg, p, x, i)
    x = jax.nn.leaky_relu(x, 0.01)  # torch-default slope, reference parity
    x = conv1d(x, p["conv_post"]["kernel"], p["conv_post"]["bias"], padding=3)
    return jnp.tanh(x)[..., 0]
