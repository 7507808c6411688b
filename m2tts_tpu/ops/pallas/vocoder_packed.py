"""Phase-packed fused Pallas vocoder: full 128-lane utilization per stage.

The fused kernel in ops/pallas/vocoder.py runs every stage with the
channel axis zero-padded to the TPU's 128-lane width. That is optimal
while channels >= 128, but the vocoder HALVES channels at each upsample
stage (reference src/models/tts_model.py:231-297), so the audio-rate
stages — which own almost all rows — run 64/32/16 real channels padded
to 128: 2-4x phantom FLOPs and VPU work exactly where rows are most
numerous. Measured consequence (docs/DESIGN.md §2): the r3 kernel is
lane-padding-bound at ~50 ms vs XLA's 13.7 ms (256 ch, batch 64x512).

This kernel removes the padding by changing the LAYOUT, not the math:
a stage with C < 128 channels packs F = 128/C consecutive time-phases
into the lane axis, so activations are [rows/F, F*C] with every lane
live. A k=3 conv in this layout is still three matmuls (center +
row-shift wraps, exactly the _mm3 pattern): the center matrix becomes
block-banded over phases — built as kron(shift_matrix, base_block) —
and the wrap matrices carry the one phase that crosses a packed-row
boundary. Upsampling transitions between packings ride the
[N, m*128k] -> [N*m, 128k] reshape already proven to lower on Mosaic
(CLAUDE.md: trailing dim must be a 128-multiple — guaranteed here by
construction: every packed stage is exactly 128 lanes wide, or C is a
128-multiple when C >= 128 with F = 1).

The output conv (C_out = 1) goes one step further: its input is first
row-merged [R, 128] -> [R/k, k*128] so each row carries 128 phases, and
the packed conv emits [R/k, 128] rows that ARE 128 consecutive audio
samples — fully dense, so the HBM output is exactly audio-sized and the
host-side reshape is a free relayout.

Row counts per window vs the unpacked kernel (flagship 256 ch, rates
8,8,2,2, win=24): stages run 192/768/768/768 packed rows instead of
192/1536/3072/6144 (+6144 output) — ~4.4x fewer 128-lane matmul rows,
which is the entire lane-padding gap DESIGN.md §2 measured.

Grid scaffolding (flat pipelined grid, double-buffered input DMA,
deferred two-slot output write-back) is identical to vocoder.py; the
audio staging/HBM output are 2-D [rows, 128] so the DMA tilings match
and dynamic row offsets are provably 8-aligned (rows_t is a multiple of
8 — the same tile*U % 1024 constraint the 1-D kernel had).

Equivalence to the XLA vocoder module is asserted in
tests/test_pallas_vocoder_packed.py (interpret mode on CPU; compiled on
real TPU by the backend shootout).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from m2tts_tpu.ops.pallas.vocoder import (
    DEFAULT_HALO,
    DEFAULT_TILE,
    LANE,
    _mm3,
    _pad_to_lane,
)


def pick_tile(T: int, U: int, halo: int = DEFAULT_HALO):
    """Largest tile (frames) valid for a [*, T, *] mel under this kernel's
    TPU constraints, or None when no candidate fits (caller falls back to
    another backend). Bigger tiles amortize the 2*halo recompute overhead:
    measured 13.6 -> 9.7 ms going 16 -> 128 at 256 ch (docs/DESIGN.md §2).
    """
    for tile in (128, 64, 32, 16):
        win = tile + 2 * halo
        if (T % tile == 0 and T >= win and halo <= tile
                and (tile * U) % (8 * LANE) == 0
                and (halo * U) % LANE == 0
                and (win * U) % LANE == 0
                and win % 8 == 0):
            return tile
    return None


def _choose_f(n_phases: int, cout: int) -> Tuple[int, int]:
    """Packing for a stage with ``n_phases`` producible phases and ``cout``
    channels: the largest F dividing both n_phases and 128 with room for
    the channels, so the lane axis is exactly 128 wide (or a 128-multiple
    when cout >= 128 forces F=1). Returns (F, cout_padded)."""
    if cout > LANE:
        return 1, _pad_to_lane(cout)
    for f in range(min(n_phases, LANE), 0, -1):
        if n_phases % f == 0 and LANE % f == 0 and LANE // f >= cout:
            return f, LANE // f
    return 1, LANE  # unreachable: f=1 always qualifies


def _pack_phase_layer(w: Array, b: Array, cin: int, cout: int, r: int,
                      fin: int, cin_pad: int, fout: int, cout_pad: int
                      ) -> Tuple[Array, Array]:
    """Base sub-pixel weight [3*cin, r*cout] + per-phase bias [cout] →
    phase-packed ([3*Lin, m*Lout], [m*Lout]) with row blocks
    [up-wrap; center-band; down-wrap] in the _mm3 convention.

    For input phase p and tap delta in {-1,0,+1}, the source phase is
    q = p + delta: in-row sources land in the center band (a kron of a
    shifted identity with the base tap block), q = -1 wraps to the
    previous packed row's last phase (up matrix), q = fin to the next
    row's phase 0 (down matrix). Static indices only — runs on tracers.
    """
    blocks = []
    for d in range(3):
        blk = jnp.zeros((cin_pad, r * cout_pad), jnp.float32)
        for j in range(r):
            blk = blk.at[:cin, j * cout_pad:j * cout_pad + cout].set(
                w[d * cin:(d + 1) * cin, j * cout:(j + 1) * cout])
        blocks.append(blk)
    # S_delta[q, p] = 1 iff q = p + delta  (np.eye k = -delta)
    band = [np.eye(fin, k=1, dtype=np.float32),    # delta = -1 interior
            np.eye(fin, k=0, dtype=np.float32),
            np.eye(fin, k=-1, dtype=np.float32)]   # delta = +1 interior
    up = np.zeros((fin, fin), np.float32)
    up[fin - 1, 0] = 1.0                           # prev row's last phase
    dn = np.zeros((fin, fin), np.float32)
    dn[0, fin - 1] = 1.0                           # next row's phase 0
    wc = sum(jnp.kron(jnp.asarray(band[d]), blocks[d]) for d in range(3))
    wfull = jnp.concatenate([jnp.kron(jnp.asarray(up), blocks[0]),
                             wc,
                             jnp.kron(jnp.asarray(dn), blocks[2])], axis=0)
    bpad = jnp.zeros((cout_pad,), jnp.float32).at[:cout].set(b)
    return wfull, jnp.tile(bpad, fin * r)


def _plan_and_pack(packed: Dict, rates: Sequence[int], compute_dtype
                   ) -> Tuple[List[Array], Dict]:
    """Packed vocoder weights → phase-packed flat list + static plan.

    Flat list order matches the kernel's take() order: input conv, per
    stage (tconv, res1, res2), output conv; even entries weight matrices
    (cast to the compute dtype), odd entries f32 biases.
    """
    iw, ib = packed["input_conv"]["w"], packed["input_conv"]["b"]
    c_mel = iw.shape[0] // 3
    c0 = iw.shape[1]
    c_mel_pad = _pad_to_lane(c_mel)
    # input conv: fin = 1 (mel rate), r = 1 forces fout = 1
    f, cp = 1, _pad_to_lane(c0)
    flat = list(_pack_phase_layer(iw, ib, c_mel, c0, 1, 1, c_mel_pad, 1, cp))
    stage_meta = []
    for r, st in zip(rates, packed["stages"]):
        cin = st["tconv"]["w"].shape[0] // 3
        cout = st["tconv"]["cout"]
        fout, cout_pad = _choose_f(f * r, cout)
        m = (f * r) // fout
        lout = fout * cout_pad
        flat += _pack_phase_layer(st["tconv"]["w"], st["tconv"]["b"],
                                  cin, cout, r, f, cp, fout, cout_pad)
        for key in ("res1", "res2"):
            flat += _pack_phase_layer(st[key]["w"], st[key]["b"],
                                      cout, cout, 1, fout, cout_pad,
                                      fout, cout_pad)
        stage_meta.append({"m": m, "lout": lout})
        f, cp = fout, cout_pad
    # output conv: row-merge k rows so each packed row holds 128 phases,
    # then a packed conv with cout = 1 emits 128 audio samples per row
    k = LANE // f
    ow, ob = packed["output_conv"]["w"], packed["output_conv"]["b"]
    c_last = ow.shape[0] // 3
    flat += _pack_phase_layer(ow, ob, c_last, 1, 1, LANE, cp, LANE, 1)
    meta = {"c_mel_pad": c_mel_pad, "stages": stage_meta, "repack_k": k,
            "f_last": f}
    return [jnp.asarray(a, compute_dtype if i % 2 == 0 else jnp.float32)
            for i, a in enumerate(flat)], meta


def fused_vocoder_packed_forward(mel: Array, packed: Dict,
                                 rates: Sequence[int],
                                 tile: int = DEFAULT_TILE,
                                 halo: int = DEFAULT_HALO,
                                 interpret: bool = False,
                                 compute_dtype: str = "f32") -> Array:
    """mel [B, T, C] → audio [B, T*U]; T % tile == 0, T >= tile + 2*halo.

    Same pipelined grid as ops/pallas/vocoder.py::fused_vocoder_forward
    (window clamp at utterance edges for exact SAME padding, prefetch of
    window i+1 during compute of i, two-slot deferred output DMA), with
    the phase-packed compute body and a dense 2-D audio output:
    out HBM is [B*Q*rows_t, 128] whose row-major bytes ARE the audio, so
    the final reshape is layout-free.
    """
    rates = tuple(rates)
    U = 1
    for r in rates:
        U *= r
    cdtype = jnp.bfloat16 if compute_dtype == "bf16" else jnp.float32
    win = tile + 2 * halo
    # integrality the packed layout itself needs (any mode):
    if (tile * U) % LANE or (halo * U) % LANE or (win * U) % LANE:
        raise ValueError(
            f"packed vocoder: tile*U={tile * U}, halo*U={halo * U} and "
            f"win*U={win * U} must all be multiples of {LANE} (audio rows "
            f"carry 128 samples); raise tile/halo or use another backend")
    if not interpret:
        # real-TPU Mosaic constraints (probed on v5e, see vocoder.py):
        if (tile * U) % (8 * LANE):
            raise ValueError(
                f"packed vocoder: tile*U = {tile * U} must be a multiple "
                f"of 1024 on TPU (output rows_t must be 8-aligned)")
        if win % 8:
            raise ValueError(
                f"packed vocoder: tile+2*halo = {win} must be a multiple "
                f"of 8 on TPU (VMEM sublane tiling)")
    if halo > tile:
        raise ValueError(f"halo={halo} must be <= tile={tile}")
    flat_weights, meta = _plan_and_pack(packed, rates, cdtype)
    n_w = len(flat_weights)
    C_pad = meta["c_mel_pad"]
    stage_meta = meta["stages"]
    repack_k = meta["repack_k"]

    B, T, C = mel.shape
    if T % tile or T < win:
        raise ValueError(f"T={T} must be a multiple of tile={tile} and >= {win}")
    if C != C_pad:
        mel = jnp.pad(mel, ((0, 0), (0, 0), (0, C_pad - C)))
    Q = T // tile
    total = B * Q
    rows_t = (tile * U) // LANE   # audio rows per tile (128 samples each)
    rows_h = (halo * U) // LANE   # audio rows per halo

    def kernel(mel_hbm, *refs):
        w_refs = refs[:n_w]
        out_ref = refs[n_w]  # [total*rows_t, 128] dense audio rows
        win_buf, audio_buf0, audio_buf1, in_sem, out_sem = \
            refs[n_w + 1:n_w + 6]

        i = pl.program_id(0)

        def win_of(j):
            b = j // Q
            q = j - b * Q
            start = jnp.clip(q * tile - halo, 0, T - win)
            return b, q, start

        def in_dma(j, slot):
            b, _, start = win_of(j)
            return pltpu.make_async_copy(
                mel_hbm.at[b, pl.ds(start, win), :], win_buf.at[slot],
                in_sem.at[slot])

        def out_dma(buf, j, slot):
            # 2-D row-sliced DMA; offset j*rows_t is provably 8-aligned
            return pltpu.make_async_copy(
                buf, out_ref.at[pl.ds(j * rows_t, rows_t), :],
                out_sem.at[slot])

        slot = i % 2

        @pl.when(i == 0)
        def _():  # first program fetches its own window
            in_dma(i, slot).start()

        @pl.when(i + 1 < total)
        def _():  # prefetch the NEXT window into the other slot
            in_dma(i + 1, (i + 1) % 2).start()

        in_dma(i, slot).wait()

        x = win_buf[slot].astype(cdtype)
        wi = 0

        def take():
            nonlocal wi
            pair = (w_refs[wi], w_refs[wi + 1])
            wi += 2
            return pair

        w, bias = take()
        x = _mm3(x, w, bias).astype(cdtype)  # input conv, [win, c0_pad]
        for sm in stage_meta:
            tw, tb = take()
            y = _mm3(x, tw, tb)              # [R, m*lout] f32
            if sm["m"] > 1:                  # phase merge → more rows
                y = y.reshape(y.shape[0] * sm["m"], sm["lout"])
            y = jnp.where(y >= 0, y, 0.1 * y).astype(cdtype)  # leaky 0.1
            r1w, r1b = take()
            h = _mm3(y, r1w, r1b)
            h = jnp.where(h >= 0, h, 0.1 * h).astype(cdtype)
            r2w, r2b = take()
            x = (y.astype(jnp.float32)
                 + _mm3(h, r2w, r2b)).astype(cdtype)  # residual add in f32
        if repack_k > 1:  # row-merge so each row carries 128 phases
            x = x.reshape(x.shape[0] // repack_k,
                          repack_k * x.shape[1])
        ow, ob = take()
        audio = jnp.tanh(_mm3(x, ow, ob))    # [win*U/128, 128] f32, dense

        # center-window extraction in whole audio rows (window start was
        # clamped, so the offset is 0 / 2*rows_h / rows_h — static slices
        # + vector selects, same scheme as the unpacked kernel)
        _, q, _ = win_of(i)
        mid = audio[rows_h: rows_h + rows_t]
        first = audio[0: rows_t]
        last = audio[2 * rows_h: 2 * rows_h + rows_t]
        center = jnp.where(q == 0, first,
                           jnp.where(q == Q - 1, last, mid) if Q > 1 else mid)

        # deferred two-slot write-back (see vocoder.py for the rationale)
        @pl.when(slot == 0)
        def _():
            @pl.when(i >= 2)
            def _():
                out_dma(audio_buf0, i - 2, 0).wait()
            audio_buf0[...] = center
            out_dma(audio_buf0, i, 0).start()

        @pl.when(slot == 1)
        def _():
            @pl.when(i >= 2)
            def _():
                out_dma(audio_buf1, i - 2, 1).wait()
            audio_buf1[...] = center
            out_dma(audio_buf1, i, 1).start()

        @pl.when(i == total - 1)
        def _():
            if total > 1:
                prev = (audio_buf0, audio_buf1)[(total - 2) % 2]
                out_dma(prev, i - 1, (total - 2) % 2).wait()
            own = (audio_buf0, audio_buf1)[(total - 1) % 2]
            out_dma(own, i, (total - 1) % 2).wait()

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] + [
        pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_w)]
    out_spec = pl.BlockSpec(memory_space=pl.ANY)
    audio_rows = pl.pallas_call(
        kernel,
        grid=(total,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((total * rows_t, LANE), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, win, C_pad), jnp.float32),
            pltpu.VMEM((rows_t, LANE), jnp.float32),
            pltpu.VMEM((rows_t, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(mel, *flat_weights)
    # rows are consecutive 128-sample spans in program order → free reshape
    return audio_rows.reshape(B, T * U)


def build_fused_vocoder_packed(packed: Dict, rates: Sequence[int],
                               tile: int = DEFAULT_TILE,
                               halo: int = DEFAULT_HALO,
                               interpret: bool = False,
                               compute_dtype: str = "f32"):
    """fn(mel) closure over pre-packed weights (tests / eager use).

    For jitted serving graphs call ``fused_vocoder_packed_forward`` with
    packed weights derived inside the trace (pack_vocoder_weights is
    trace-friendly); a closure over concrete arrays embeds them as
    compile-time constants.
    """
    return partial(fused_vocoder_packed_forward, packed=packed,
                   rates=tuple(rates), tile=tile, halo=halo,
                   interpret=interpret, compute_dtype=compute_dtype)
