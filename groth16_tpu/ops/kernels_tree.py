"""Pallas TPU kernels for the batched-affine merge-tree MSM (ops/msm_tree.py).

One tree level = one batch of independent affine additions mid = A + B.
The slope denominators are inverted with Montgomery's batch trick split
across three kernels so ONE Fermat inversion serves the whole level:

  A (grid over lane blocks): per sequential slot t of each lane, compute
    the masked slope denominator and its running per-lane product; emit
    ONLY the per-lane totals [R, M] (num/den/prefix streams are
    recomputed in-VMEM by B — the mids are memory-bound, so the original
    three-stream HBM round-trip was ~45% of the level traffic).
  I (single step, level-wide): product-tree the per-lane totals down to
    the native 128-lane width, invert those 128 residual products with
    one Fermat ladder (exponent bits streamed from SMEM), and walk the
    tree back up to per-lane inverses.
  B (grid over lane blocks): forward sweep recomputes den + exclusive
    prefix products in registers/VMEM, reverse sweep expands the lane
    inverse to per-element inverses and finishes the affine add
    (lambda, x3, y3) with doubling / cancellation / infinity lanes
    resolved by selects.

Element layout is t-major limb-major: a level of K adds is viewed as
[T, rows, M] with M = K/T lanes, so each grid step keeps a [T, rows, LB]
stripe VMEM-resident for all T sequential steps.  Cost per add: ~7 Fp
muls (vs ~13 for the RCB15 fold in ops/kernels.py) — the point of the
whole exercise.

Arithmetic bodies are shared with ops/kernels.py (_KFp/_KFp2);
exception-case semantics match ops/msm_tree.mid_jnp exactly (parity is
tested on the CPU path and on-TPU by tools/run_tree_tpu.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .field import FP
from .limbs import N_LIMBS
from .kernels import _KFp, _KFp2, _on_tpu, _DISABLE

T_SLOTS = 16   # sequential elements per lane per level
INV_W = 128    # width at which the product tree stops and Fermat runs

# p - 2 bits, LSB first, padded to a static length (exponent for Fermat
# inversion in Fp; Fp2 inversion reduces to this via the norm trick)
_EXP = FP.modulus - 2
_EXP_NBITS = _EXP.bit_length()
_EXP_BITS = np.asarray([(_EXP >> i) & 1 for i in range(_EXP_NBITS)], np.int32)


def _rows(cv) -> int:
    """uint32 limb rows per field element (16 Fp / 32 Fp2)."""
    return 16 if cv.name == "G1" else 32


def mid_available(cv, k: int) -> bool:
    return (not _DISABLE) and _on_tpu()


def _consts(cv, lb: int):
    """Kernel constant planes broadcast to LB lanes."""
    def tile(x):
        return np.repeat(np.asarray(x, np.uint32).reshape(-1, 1), lb, axis=1)
    return (tile(FP.p_limbs), tile(FP.pprime_limbs), tile(FP.pc_limbs),
            tile(cv.one_limbs))


def _mk_field(cv_name, p_ref, pp_ref, pc_ref):
    fp = _KFp(p_ref[:], pp_ref[:], pc_ref[:])
    return fp, (fp if cv_name == "G1" else _KFp2(fp))


def _comp(cv_name, x, lb):
    """[rows, LB] slab -> field-element view ([16,LB] or [2,16,LB])."""
    return x if cv_name == "G1" else x.reshape(2, N_LIMBS, lb)


def _flat(cv_name, x, lb):
    return x if cv_name == "G1" else x.reshape(2 * N_LIMBS, lb)


def _eq_mask(cv_name, a, b):
    """All-limb equality -> [1, LB] bool."""
    m = jnp.all(a == b, axis=0)
    if cv_name != "G1":
        m = jnp.all(m, axis=0)
    return m[None, :]


def _sel(cv_name, cond, a, b):
    c = cond if cv_name == "G1" else cond[:, None, :]
    return jnp.where(c, a, b)


def _slot_den(cv_name, K, one, a, b, lb, R):
    """Masked slope denominator for one [R2, lb] point-pair slot, plus the
    pieces phase B reuses (x/y views and exception masks).  den is exactly
    `mid_jnp`'s: tangent 2y1 when doubling, chord x2-x1 otherwise, a dummy
    1 on the cancellation / infinity lanes."""
    x1 = _comp(cv_name, a[:R], lb)
    y1 = _comp(cv_name, a[R:], lb)
    x2 = _comp(cv_name, b[:R], lb)
    y2 = _comp(cv_name, b[R:], lb)
    i1 = jnp.all(a == 0, axis=0)[None, :]
    i2 = jnp.all(b == 0, axis=0)[None, :]
    eqx = _eq_mask(cv_name, x1, x2)
    eqy = _eq_mask(cv_name, y1, y2)
    dbl = eqx & eqy & ~i1
    den = _sel(cv_name, dbl, K.add(y1, y1), K.sub(x2, x1))
    safe = (eqx & ~eqy) | i1 | i2
    den = _sel(cv_name, safe, one, den)
    return den, (x1, y1, x2, y2, i1, i2, eqx, eqy, dbl)


@functools.lru_cache(maxsize=None)
def _phase_a_call(cv_name: str, M: int, lb: int):
    """Phase A emits ONLY the per-lane denominator totals [R, M]: the
    num/den/pre streams of the original three-stream design are recomputed
    in-VMEM by phase B instead of round-tripping through HBM — that cut the
    per-level traffic from ~1.2 kB to ~0.65 kB per element (the mids were
    memory-bound, docs/PERF.md)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from . import curve as CU
    cv = CU.G1 if cv_name == "G1" else CU.G2
    R = _rows(cv)
    R2 = 2 * R
    T = T_SLOTS

    def kernel(apr_ref, bpl_ref, p_ref, pp_ref, pc_ref, one_ref, tot_ref):
        fp, K = _mk_field(cv_name, p_ref, pp_ref, pc_ref)
        one = _comp(cv_name, one_ref[:], lb)
        run = one
        for t in range(T):
            a = apr_ref[:, pl.ds(t, 1), :].reshape(R2, lb)
            b = bpl_ref[:, pl.ds(t, 1), :].reshape(R2, lb)
            den, _ = _slot_den(cv_name, K, one, a, b, lb, R)
            run = K.mul(run, den)
        tot_ref[:] = _flat(cv_name, run, lb)

    pt_spec = pl.BlockSpec((R2, T, lb), lambda i: (0, 0, i),
                           memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((R, lb), lambda i: (0, i), memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(M // lb,),
        in_specs=[pt_spec, pt_spec] + [c_spec] * 4,
        out_specs=t_spec,
        out_shape=jax.ShapeDtypeStruct((R, M), jnp.uint32),
    )
    consts = _consts(cv, lb)

    def run_call(apr, bpl):
        return call(apr, bpl, *(jnp.asarray(c) for c in consts))

    return run_call


@functools.lru_cache(maxsize=None)
def _mul_rows_call(cv_name: str, W: int, lb: int):
    """Elementwise field multiply of two [R, W] limb-row streams (the
    HBM-streamed product-tree halvings of the level-wide batch inversion)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from . import curve as CU
    cv = CU.G1 if cv_name == "G1" else CU.G2
    R = _rows(cv)

    def kernel(a_ref, b_ref, p_ref, pp_ref, pc_ref, one_ref, o_ref):
        fp, K = _mk_field(cv_name, p_ref, pp_ref, pc_ref)
        r = K.mul(_comp(cv_name, a_ref[:], lb), _comp(cv_name, b_ref[:], lb))
        o_ref[:] = _flat(cv_name, r, lb)

    spec = pl.BlockSpec((R, lb), lambda i: (0, i), memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(W // lb,),
        in_specs=[spec, spec] + [c_spec] * 4,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((R, W), jnp.uint32),
    )
    consts = _consts(cv, lb)

    def run_call(a, b):
        return call(a, b, *(jnp.asarray(c) for c in consts))

    return run_call


_INV_MAXW = 2048  # widest totals array the single-step invert kernel takes


@functools.lru_cache(maxsize=None)
def _invert_call(cv_name: str, M: int):
    """Batch inversion of per-lane totals [R, M], M a small multiple of 128
    (single grid step).  The M/128 chunks fold sequentially at the native
    128-lane width (exclusive-prefix chain), ONE Fermat ladder inverts the
    grand total (Fp2 via the conjugate/norm trick), and a reverse walk
    expands back to per-lane inverses — Montgomery's trick at fixed width,
    so every kernel constant lives at one shape."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from . import curve as CU
    cv = CU.G1 if cv_name == "G1" else CU.G2
    R = _rows(cv)
    assert M % INV_W == 0 and M <= _INV_MAXW
    n_chunks = M // INV_W

    def kernel(tot_ref, bits_ref, p_ref, pp_ref, pc_ref, one_ref, inv_ref):
        fp, K = _mk_field(cv_name, p_ref, pp_ref, pc_ref)
        one = _comp(cv_name, one_ref[:], INV_W)
        chunks, pres = [], []
        run = one
        for i in range(n_chunks):
            c = _comp(cv_name,
                      tot_ref[:, pl.ds(i * INV_W, INV_W)], INV_W)
            chunks.append(c)
            pres.append(run)
            run = K.mul(run, c)
        # Fermat on the grand total (Fp2 reduces to Fp via x * conj(x))
        if cv_name == "G1":
            base = run
        else:
            base = fp.add(fp.mul(run[0], run[0]), fp.mul(run[1], run[1]))
        acc0 = one_ref[:N_LIMBS, :]

        def fermat(i, carry):
            acc, sq = carry
            acc = jnp.where(bits_ref[i] == 1, fp.mul(acc, sq), acc)
            return (acc, fp.mul(sq, sq))

        acc, _ = jax.lax.fori_loop(0, _EXP_NBITS, fermat, (acc0, base))
        if cv_name == "G1":
            tinv = acc
        else:
            zero = jnp.zeros_like(acc)
            tinv = jnp.stack([fp.mul(run[0], acc),
                              fp.sub(zero, fp.mul(run[1], acc))], axis=0)
        for i in reversed(range(n_chunks)):
            inv_ref[:, pl.ds(i * INV_W, INV_W)] = _flat(
                cv_name, K.mul(tinv, pres[i]), INV_W)
            tinv = K.mul(tinv, chunks[i])

    v_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    consts = _consts(cv, INV_W)
    call = pl.pallas_call(
        kernel,
        in_specs=[v_spec, s_spec] + [v_spec] * 4,
        out_specs=v_spec,
        out_shape=jax.ShapeDtypeStruct((R, M), jnp.uint32),
    )
    def run_call(tots):
        # (re)materialize constants per call — caching device arrays in the
        # lru_cache'd closure would leak tracers across jit traces
        return call(tots, jnp.asarray(_EXP_BITS),
                    *(jnp.asarray(c) for c in consts))

    return run_call


def _invert_rows(cv, tots: jnp.ndarray) -> jnp.ndarray:
    """Level-wide batch inversion of [R, M] per-lane totals: jnp-orchestrated
    product-tree halvings (gridded mul_rows kernels) down to <= _INV_MAXW,
    one single-step invert kernel, then the mirrored down-walk."""
    M = tots.shape[-1]
    stack = []
    x = tots
    while x.shape[-1] > _INV_MAXW and (x.shape[-1] // 2) % INV_W == 0:
        w = x.shape[-1] // 2
        stack.append(x)
        x = _mul_rows_call(cv.name, w, _pick_lb(cv, w))(x[:, :w], x[:, w:])
    inv = _invert_call(cv.name, x.shape[-1])(x)
    for lv in reversed(stack):
        w = lv.shape[-1] // 2
        mul = _mul_rows_call(cv.name, w, _pick_lb(cv, w))
        inv = jnp.concatenate([mul(inv, lv[:, w:]), mul(inv, lv[:, :w])],
                              axis=-1)
    return inv


@functools.lru_cache(maxsize=None)
def _phase_b_call(cv_name: str, M: int, lb: int):
    """Phase B: forward sweep recomputes den + the exclusive prefix products
    in-VMEM (cheap adds/selects + T muls — the original design streamed
    num/den/pre through HBM instead, and the mids are memory-bound), then
    the reverse sweep expands the lane-total inverse to per-slot inverses
    and finishes the affine add."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from . import curve as CU
    cv = CU.G1 if cv_name == "G1" else CU.G2
    R = _rows(cv)
    R2 = 2 * R
    T = T_SLOTS

    def kernel(apr_ref, bpl_ref, tinv_ref, p_ref, pp_ref, pc_ref, one_ref,
               mid_ref):
        fp, K = _mk_field(cv_name, p_ref, pp_ref, pc_ref)
        one = _comp(cv_name, one_ref[:], lb)
        dens, pres, views = [], [], []
        run = one
        for t in range(T):
            a = apr_ref[:, pl.ds(t, 1), :].reshape(R2, lb)
            b = bpl_ref[:, pl.ds(t, 1), :].reshape(R2, lb)
            den, view = _slot_den(cv_name, K, one, a, b, lb, R)
            dens.append(den)
            pres.append(run)
            views.append(view)
            run = K.mul(run, den)
        run_inv = _comp(cv_name, tinv_ref[:], lb)
        for t in reversed(range(T)):
            x1, y1, x2, y2, i1, i2, eqx, eqy, dbl = views[t]
            inv_e = K.mul(run_inv, pres[t])
            run_inv = K.mul(run_inv, dens[t])
            x3, y3 = _mid_xy(cv_name, K, views[t], inv_e)
            mid_ref[:, pl.ds(t, 1), :] = jnp.concatenate(
                [_flat(cv_name, x3, lb), _flat(cv_name, y3, lb)],
                axis=0).reshape(R2, 1, lb)

    pt_spec = pl.BlockSpec((R2, T, lb), lambda i: (0, 0, i),
                           memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((R, lb), lambda i: (0, i), memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(M // lb,),
        in_specs=[pt_spec, pt_spec, t_spec] + [c_spec] * 4,
        out_specs=pt_spec,
        out_shape=jax.ShapeDtypeStruct((R2, T, M), jnp.uint32),
    )
    consts = _consts(cv, lb)

    def run_call(apr, bpl, tinv):
        return call(apr, bpl, tinv, *(jnp.asarray(c) for c in consts))

    return run_call


def _mid_xy(cv_name, K, view, inv_e):
    """Finish one affine add given the per-slot den inverse: lam, x3, y3 with
    the doubling / cancellation / infinity lanes resolved by selects (the
    exact semantics of msm_tree.mid_jnp)."""
    x1, y1, x2, y2, i1, i2, eqx, eqy, dbl = view
    x1sq = K.sqr(x1)
    num = _sel(cv_name, dbl, K.add(K.add(x1sq, x1sq), x1sq), K.sub(y2, y1))
    lam = K.mul(num, inv_e)
    x3 = K.sub(K.sub(K.sqr(lam), x1), x2)
    y3 = K.sub(K.mul(lam, K.sub(x1, x3)), y1)
    cancel = eqx & ~eqy
    zero = jnp.zeros_like(x3)
    x3 = _sel(cv_name, cancel, zero, x3)
    y3 = _sel(cv_name, cancel, zero, y3)
    x3 = _sel(cv_name, i2, x1, _sel(cv_name, i1, x2, x3))
    y3 = _sel(cv_name, i2, y1, _sel(cv_name, i1, y2, y3))
    return x3, y3


@functools.lru_cache(maxsize=None)
def _phase_b_level_call(cv_name: str, M: int, lb: int, want_em: bool):
    """Phase B, whole-level form: same inverse-expansion + affine-add body as
    `_phase_b_call`, but ALSO applies the tree's node-update selects in-VMEM
    and writes the three level outputs directly:

        PL' = match & aP ? mid : A_pl
        PR' = match & bP ? mid : B_pr
        EM0 = match      ? mid : A_pr      (emission slot 0; skipped at
                                            level 1 where no segment can
                                            close — want_em=False)

    This replaces three full-plane jnp.where passes per level (~9 HBM
    stream traversals) with two extra in-kernel reads (A_pl, B_pr) and the
    fused writes — the tree glue was ~40% of group wall time as jnp ops
    (docs/PERF.md round-5)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from . import curve as CU
    cv = CU.G1 if cv_name == "G1" else CU.G2
    R = _rows(cv)
    R2 = 2 * R
    T = T_SLOTS

    def kernel(apl_ref, apr_ref, bpl_ref, bpr_ref, flg_ref, tinv_ref,
               p_ref, pp_ref, pc_ref, one_ref, *out_refs):
        pl_ref, pr_ref = out_refs[0], out_refs[1]
        em_ref = out_refs[2] if want_em else None
        fp, K = _mk_field(cv_name, p_ref, pp_ref, pc_ref)
        one = _comp(cv_name, one_ref[:], lb)
        dens, pres, views = [], [], []
        run = one
        for t in range(T):
            a = apr_ref[:, pl.ds(t, 1), :].reshape(R2, lb)
            b = bpl_ref[:, pl.ds(t, 1), :].reshape(R2, lb)
            den, view = _slot_den(cv_name, K, one, a, b, lb, R)
            dens.append(den)
            pres.append(run)
            views.append(view)
            run = K.mul(run, den)
        run_inv = _comp(cv_name, tinv_ref[:], lb)
        for t in reversed(range(T)):
            inv_e = K.mul(run_inv, pres[t])
            run_inv = K.mul(run_inv, dens[t])
            x3, y3 = _mid_xy(cv_name, K, views[t], inv_e)
            mid = jnp.concatenate(
                [_flat(cv_name, x3, lb), _flat(cv_name, y3, lb)], axis=0)
            fl = flg_ref[pl.ds(t, 1), :].reshape(1, lb)
            m = (fl & 1) != 0
            aP = (fl & 2) != 0
            bP = (fl & 4) != 0
            a_pl = apl_ref[:, pl.ds(t, 1), :].reshape(R2, lb)
            b_pr = bpr_ref[:, pl.ds(t, 1), :].reshape(R2, lb)
            a_pr = apr_ref[:, pl.ds(t, 1), :].reshape(R2, lb)
            pl_ref[:, pl.ds(t, 1), :] = jnp.where(
                m & aP, mid, a_pl).reshape(R2, 1, lb)
            pr_ref[:, pl.ds(t, 1), :] = jnp.where(
                m & bP, mid, b_pr).reshape(R2, 1, lb)
            if want_em:
                em_ref[:, pl.ds(t, 1), :] = jnp.where(
                    m, mid, a_pr).reshape(R2, 1, lb)

    pt_spec = pl.BlockSpec((R2, T, lb), lambda i: (0, 0, i),
                           memory_space=pltpu.VMEM)
    f_spec = pl.BlockSpec((T, lb), lambda i: (0, i), memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((R, lb), lambda i: (0, i), memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    n_out = 3 if want_em else 2
    call = pl.pallas_call(
        kernel,
        grid=(M // lb,),
        in_specs=[pt_spec] * 4 + [f_spec, t_spec] + [c_spec] * 4,
        out_specs=(pt_spec,) * n_out,
        out_shape=tuple(jax.ShapeDtypeStruct((R2, T, M), jnp.uint32)
                        for _ in range(n_out)),
    )
    consts = _consts(cv, lb)

    def run_call(apl, apr, bpl, bpr, flg, tinv):
        return call(apl, apr, bpl, bpr, flg, tinv,
                    *(jnp.asarray(c) for c in consts))

    return run_call


def _pick_lb(cv, M: int) -> int:
    """Lane-block per grid step, VMEM-bounded (G2 rows are 2x wider; at 512
    lanes the double-buffered phase-A blocks + Mosaic stack measured 18.5 MB
    against the 16 MB scoped-vmem limit)."""
    cap = 256 if cv.name == "G1" else 128
    for lb in (256, 128):
        if lb <= cap and M % lb == 0:
            return lb
    return 128


def level_pallas(cv, A_pl, A_pr, B_pl, B_pr, match, aP, bP, want_em: bool):
    """TPU drop-in for msm_tree.level_jnp: one whole tree level — mids via
    the 3-phase batch-inversion kernels plus the PL'/PR'/EM0 node-update
    selects fused into phase B.  Inputs are LIMB-MAJOR fused x|y columns
    uint32[2*ncomp, K] and bool[K] flag planes; returns (PL', PR', EM0) with
    EM0 = None when want_em is False (level 1 never emits)."""
    R2, K = A_pl.shape
    T = T_SLOTS
    tile = T * INV_W
    Kp = -(-K // tile) * tile

    def padp(x):
        return jnp.pad(x, ((0, 0), (0, Kp - K))) if Kp > K else x

    flg = (match.astype(jnp.int32) | (aP.astype(jnp.int32) << 1)
           | (bP.astype(jnp.int32) << 2))
    if Kp > K:
        flg = jnp.pad(flg, (0, Kp - K))
    M = Kp // T
    lb = _pick_lb(cv, M)
    apl, apr, bpl, bpr = (padp(x).reshape(R2, T, M)
                          for x in (A_pl, A_pr, B_pl, B_pr))
    flg = flg.reshape(T, M)
    tots = _phase_a_call(cv.name, M, lb)(apr, bpl)
    tinv = _invert_rows(cv, tots)
    outs = _phase_b_level_call(cv.name, M, lb, want_em)(
        apl, apr, bpl, bpr, flg, tinv)
    outs = tuple(o.reshape(R2, Kp)[:, :K] for o in outs)
    return (outs[0], outs[1], outs[2] if want_em else None)


def mid_pallas(cv, a_cols: jnp.ndarray, b_cols: jnp.ndarray) -> jnp.ndarray:
    """TPU drop-in for msm_tree.mid_jnp: batched affine mid = A + B on
    LIMB-MAJOR fused x|y columns uint32[2*ncomp, K].  Pads K up to a
    [T_SLOTS, >=128] tile (pad columns are (0,0)+(0,0) -> den 1, mid (0,0),
    sliced off on return); the [R2, T, M] element view is a free reshape of
    the minor axis — no transposes anywhere."""
    R2, K = a_cols.shape
    T = T_SLOTS
    tile = T * INV_W
    Kp = -(-K // tile) * tile
    if Kp > K:
        a_cols = jnp.pad(a_cols, ((0, 0), (0, Kp - K)))
        b_cols = jnp.pad(b_cols, ((0, 0), (0, Kp - K)))
    M = Kp // T
    lb = _pick_lb(cv, M)

    apr = a_cols.reshape(R2, T, M)
    bpl = b_cols.reshape(R2, T, M)
    tots = _phase_a_call(cv.name, M, lb)(apr, bpl)
    tinv = _invert_rows(cv, tots)
    mid = _phase_b_call(cv.name, M, lb)(apr, bpl, tinv)
    return mid.reshape(R2, Kp)[:, :K]
