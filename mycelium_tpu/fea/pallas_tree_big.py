"""Hybrid whole-CG Pallas kernel for large meshes (309k+ DOF).

The single-kernel tree solve (pallas_tree.py) carries the PCR
factorization — chains of 3x3-field (9-plane) products — inside the Mosaic
program. Past ~150k DOF the register allocator assigns every one of those
plane-sized intermediates a dedicated VMEM spill slot (~80-90 MB measured
at 309k DOF), which busts VMEM regardless of how small the static tables
are. This module splits the solve:

  1. FACTORIZATION once per solve in XLA (tree_jax.tree_factor — the same
     exact numbers, ~10-20 ms of dispatch-bound small ops at 309k DOF),
     with the per-level (round, slot, 3, 3) coefficients reshaped into the
     kernel's packed plane layout by _factor_planes (a handful of big
     XLA ops);
  2. the ENTIRE CG loop — chain matvec, forward/backward tree-PC apply,
     vector updates — as ONE Mosaic kernel whose only 3x3-field data are
     read-only inputs. The loop body touches vectors (3-plane tuples), so
     register pressure stays low and the kernel fits VMEM to ~500k DOF.

Selection is by VMEM estimate in model.build_model: full kernel when it
fits, this hybrid next, the pure-XLA path last. Uses the same unified
chain==slot ordering and the same PackedTreeData tables (a subset).

Reference analogue: PETSc KSPSolve+ICC at scale
(src/fea_petsc_parallel.cpp:336-351 is the reference's answer to big
meshes; this is ours on one chip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import FeaConfig
from .chain import BLOCK
from .solve import SolveResult

HI = lax.Precision.HIGHEST


def hybrid_vmem_bytes(schedule, n_nodes: int) -> int:
    """VMEM estimate for the hybrid CG kernel (tables + inputs + scratch).

    Dominant terms: the PCR coefficient INPUTS (2*r*9 slot planes) and the
    jump/endpoint one-hot tables — all linear-ish in mesh size. No
    9-tuple factorization lives in-kernel, so the residual-spill allowance
    is small.
    """
    from .pallas_cg import plan_nb
    from .pallas_tree import tree_slot_blocks
    levels = schedule.levels
    L = len(levels)
    P_tot = sum(len(lv.first_pos) for lv in levels)
    NBt = tree_slot_blocks(schedule)
    NPb = ((max(P_tot // BLOCK + 1, 1) + 7) // 8) * 8
    Sp, Pp = NBt * BLOCK, NPb * BLOCK
    nbc = max(plan_nb(n_nodes), NBt)
    r_star = 0
    for lv in levels:
        lens = lv.last_pos - lv.first_pos + 1
        maxlen = int(lens.max()) if len(lens) else 1
        r_star = max(r_star, int(np.ceil(np.log2(max(maxlen, 1)))))
    f32s = (
        2 * max(r_star, 1) * 9 * Sp     # ascr/bscr inputs
        + 9 * Sp + 2 * 9 * Pp           # dinv, ab0/ab1 inputs
        + L * Sp + L * Pp               # lvm, pvm
        + 3 * nbc * BLOCK               # slotcov
        + 7 * 3 * nbc * BLOCK           # uk/x0/freem/cn/ckax/ckbd/cact in
        + 2 * 9 * nbc * BLOCK           # chain_scr + cg_scr
        + 3 * nbc * BLOCK               # x_out
        + 20 * Sp                       # live temporaries / residual spills
        + 2 * 1024 * (NBt + BLOCK)      # chunk upcast transients
    )
    bf16s = (
        2 * 2 * Pp * (NBt + BLOCK)      # fl, at
        + Pp * (NPb + BLOCK)            # idp
        + 2 * Pp * (2 * NPb + BLOCK)    # id2p
    )
    return 4 * f32s + 2 * bf16s


def _factor_planes(tplan, factor, nbt: int, npb: int, r_star: int):
    """Reshape tree_jax.TreeFactor into the kernel's packed plane layout.

    Returns (ascr, bscr) (r*9*NBt, 128), dinv9 (9*NBt, 128) and
    attB0/attB1 (9*NPb, 128). Rounds a level did not run are zero, which
    makes the kernel's global r_star-round pcr_update a no-op there —
    identical semantics to the full kernel's level-masked coefficients.
    """
    meta = tplan.meta
    L = len(meta.level_steps)
    S_tot = tplan.n_slots
    P_tot = tplan.n_paths
    Sp, Pp = nbt * BLOCK, npb * BLOCK
    f32 = jnp.float32

    def pack_rounds(parts):
        # parts[li]: (steps_li, S_li, 3, 3) -> (r_star, S_tot, 3, 3)
        padded = []
        for li in range(L):
            p = parts[li].astype(f32)
            pad_r = r_star - p.shape[0]
            if pad_r:
                p = jnp.concatenate(
                    [p, jnp.zeros((pad_r,) + p.shape[1:], f32)], axis=0)
            padded.append(p)
        allp = jnp.concatenate(padded, axis=1)          # (r, S_tot, 3, 3)
        allp = jnp.pad(allp, ((0, 0), (0, Sp - S_tot), (0, 0), (0, 0)))
        # row order: k-major, then (i, j), then slot plane rows
        return jnp.transpose(allp, (0, 2, 3, 1)).reshape(
            r_star * 9 * nbt, BLOCK)

    ascr = pack_rounds(factor.alphas)
    bscr = pack_rounds(factor.betas)

    dinv = jnp.pad(factor.dinv.astype(f32), ((0, Sp - S_tot), (0, 0),
                                             (0, 0)))
    dinv9 = jnp.transpose(dinv, (1, 2, 0)).reshape(9 * nbt, BLOCK)

    ab = jnp.pad(factor.att_b.astype(f32),
                 ((0, Pp - P_tot), (0, 0), (0, 0), (0, 0)))
    ab0 = jnp.transpose(ab[:, 0], (1, 2, 0)).reshape(9 * npb, BLOCK)
    ab1 = jnp.transpose(ab[:, 1], (1, 2, 0)).reshape(9 * npb, BLOCK)
    return ascr, bscr, dinv9, ab0, ab1


# ---------------------------------------------------------------------------
# kernel: the CG loop only (factorization arrives as inputs)
# ---------------------------------------------------------------------------

def _cg_big_kernel(nbc, nbt, npb, n_levels, r_star, jp, max_iter, rtol,
                   reg,
                   uk_ref, x0_ref, freem_ref, cact_ref, cn_ref, ckax_ref,
                   ckbd_ref, ab_blk_ref, ab_lane_ref, jscal_ref, jact_ref,
                   ascr_ref, bscr_ref, dinv_ref, ab0_ref, ab1_ref,
                   lvm_ref, pvm_ref,
                   fl_blk_ref, fl_lane_ref, at_blk_ref, at_lane_ref,
                   idp_blk_ref, idp_lane_ref, id2p_blk_ref, id2p_lane_ref,
                   slotcov_ref,
                   x_out_ref, stats_ref,
                   chain_scr, cg_scr):
    f32 = jnp.float32
    from .pallas_cg import JUMP_CHUNK

    def read9(ref, nb, base=0):
        return tuple(ref[pl.ds(base + k * nb, nb)] for k in range(9))

    def mv(M, v):
        return tuple(M[3 * i] * v[0] + M[3 * i + 1] * v[1]
                     + M[3 * i + 2] * v[2] for i in range(3))

    def m_t(M):
        return (M[0], M[3], M[6], M[1], M[4], M[7], M[2], M[5], M[8])

    def madd(A, B):
        return tuple(a + b for a, b in zip(A, B))

    def shift_p(x, s):
        nr = x.shape[0]
        t = s % BLOCK
        q = (s // BLOCK) % nr
        ln = lax.broadcasted_iota(jnp.int32, x.shape, 1)
        a = pltpu.roll(x, (-t) % BLOCK, 1)
        b0 = pltpu.roll(a, (nr - q) % nr, 0)
        b1 = pltpu.roll(a, (nr - q - 1) % nr, 0)
        return jnp.where(ln >= BLOCK - t, b1, b0)

    def shift_m(x, s):
        nr = x.shape[0]
        t = s % BLOCK
        q = (s // BLOCK) % nr
        ln = lax.broadcasted_iota(jnp.int32, x.shape, 1)
        a = pltpu.roll(x, t % BLOCK, 1)
        b0 = pltpu.roll(a, q, 0)
        b1 = pltpu.roll(a, (q + 1) % nr, 0)
        return jnp.where(ln < t, b1, b0)

    def tshift_p(T, s):
        return tuple(shift_p(t, s) for t in T)

    def tshift_m(T, s):
        return tuple(shift_m(t, s) for t in T)

    contract0 = (((0,), (0,)), ((), ()))
    RCHUNK = 1024

    def _move(blk_ref, lane_ref, id_pair, src_plane, dst_shape, row0,
              n_rows):
        out = jnp.zeros(dst_shape, f32)
        for c0 in range(0, n_rows, RCHUNK):
            n = min(RCHUNK, n_rows - c0)
            sl = pl.ds(row0 + c0, n)
            tmp = jnp.dot(blk_ref[sl, :].astype(f32), src_plane,
                          precision=HI, preferred_element_type=f32)
            vals = jnp.sum(tmp * lane_ref[sl, :].astype(f32), axis=1,
                           keepdims=True)
            out = out + lax.dot_general(
                id_pair[0][pl.ds(c0, n), :].astype(f32),
                id_pair[1][pl.ds(c0, n), :].astype(f32) * vals,
                contract0, precision=HI, preferred_element_type=f32)
        return out

    def _move_back(blk_ref, lane_ref, id_pair, src_plane, dst_shape, row0,
                   n_rows):
        out = jnp.zeros(dst_shape, f32)
        for c0 in range(0, n_rows, RCHUNK):
            n = min(RCHUNK, n_rows - c0)
            sl = pl.ds(row0 + c0, n)
            isl = pl.ds(c0, n)
            tmp = jnp.dot(id_pair[0][isl, :].astype(f32), src_plane,
                          precision=HI, preferred_element_type=f32)
            vals = jnp.sum(tmp * id_pair[1][isl, :].astype(f32), axis=1,
                           keepdims=True)
            out = out + lax.dot_general(
                blk_ref[sl, :].astype(f32),
                lane_ref[sl, :].astype(f32) * vals,
                contract0, precision=HI, preferred_element_type=f32)
        return out

    idp = (idp_blk_ref, idp_lane_ref)
    id2p = (id2p_blk_ref, id2p_lane_ref)
    pp = npb * BLOCK

    def gather_vec(blk_ref, lane_ref, dst_id, v, dst_nb, row0=0,
                   n_rows=None):
        n_rows = n_rows if n_rows is not None else blk_ref.shape[0]
        return tuple(_move(blk_ref, lane_ref, dst_id, comp,
                           (dst_nb, BLOCK), row0, n_rows) for comp in v)

    def scatter_vec(blk_ref, lane_ref, src_id, v, dst_nb, row0=0,
                    n_rows=None):
        n_rows = n_rows if n_rows is not None else blk_ref.shape[0]
        return tuple(_move_back(blk_ref, lane_ref, src_id, comp,
                                (dst_nb, BLOCK), row0, n_rows)
                     for comp in v)

    # ---------------- chain matvec (see pallas_cg.py) ----------------
    cact = cact_ref[:]
    chain_scr[pl.ds(0, 3 * nbc)] = cn_ref[:] * cact
    chain_scr[pl.ds(3 * nbc, 3 * nbc)] = ckax_ref[:] * cact
    chain_scr[pl.ds(6 * nbc, 3 * nbc)] = ckbd_ref[:] * cact
    c_rows = 3 * nbc
    c_lane = lax.broadcasted_iota(jnp.int32, (c_rows, BLOCK), 1)
    last_lane = c_lane == BLOCK - 1
    first_lane = c_lane == 0
    n_chunks = jp // JUMP_CHUNK

    def roll(x, shift, axis):
        return pltpu.roll(x, shift % x.shape[axis], axis)

    def shift_up_c(x):
        a = roll(x, -1, 1)
        b = roll(a, -1, 0)
        return jnp.where(last_lane, b, a)

    def shift_down_c(x):
        a = roll(x, 1, 1)
        b = roll(a, 1, 0)
        return jnp.where(first_lane, b, a)

    def plane_sum(s):
        return (s[0 * nbc:1 * nbc] + s[1 * nbc:2 * nbc]
                + s[2 * nbc:3 * nbc])

    def tile3c(p):
        return jnp.concatenate([p, p, p], axis=0)

    def matvec_raw(u):
        cn = chain_scr[pl.ds(0, 3 * nbc)]
        ckax = chain_scr[pl.ds(3 * nbc, 3 * nbc)]
        ckbd = chain_scr[pl.ds(6 * nbc, 3 * nbc)]
        d = u - shift_up_c(u)
        nd = tile3c(plane_sum(cn * d))
        fx = ckax * nd * cn + ckbd * (d - nd * cn)
        out = fx - shift_down_c(fx)
        u_planes = (u[0 * nbc:1 * nbc], u[1 * nbc:2 * nbc],
                    u[2 * nbc:3 * nbc])

        def chunk_body(ci, out):
            sl2 = pl.ds(ci * 2 * JUMP_CHUNK, 2 * JUMP_CHUNK)
            slp = pl.ds(ci * JUMP_CHUNK, JUMP_CHUNK)
            ab_blk = ab_blk_ref[sl2, :].astype(f32)
            ab_lane = ab_lane_ref[sl2, :].astype(f32)
            jscal = jscal_ref[slp, :]
            jact1 = jact_ref[slp, :][:, 0:1]
            jn = (jscal[:, 0:1], jscal[:, 1:2], jscal[:, 2:3])
            jkax = jscal[:, 3:4] * jact1
            jkbd = jscal[:, 4:5] * jact1
            dj = []
            for k in range(3):
                t = jnp.dot(ab_blk, u_planes[k], precision=HI,
                            preferred_element_type=f32)
                sel = jnp.sum(t * ab_lane, axis=1, keepdims=True)
                dj.append(sel[:JUMP_CHUNK] - sel[JUMP_CHUNK:])
            ndj = jn[0] * dj[0] + jn[1] * dj[1] + jn[2] * dj[2]
            diffs = []
            for k in range(3):
                fj = jkax * ndj * jn[k] + jkbd * (dj[k] - ndj * jn[k])
                fj2 = jnp.concatenate([fj, -fj], axis=0)
                diffs.append(
                    lax.dot_general(ab_blk, ab_lane * fj2, contract0,
                                    precision=HI,
                                    preferred_element_type=f32))
            return out + jnp.concatenate(diffs, axis=0)

        return lax.fori_loop(0, n_chunks, chunk_body, out)

    def matvec(u):
        freem = freem_ref[:]
        uf = freem * u
        return freem * (matvec_raw(uf) + reg * uf) + (1.0 - freem) * u

    # ---------------- tree-PC apply ----------------
    zero_s = jnp.zeros((nbt, BLOCK), f32)

    def pcr_update(rv, lvm):
        def round_body(k, rv):
            s = jnp.int32(1) << k
            a = read9(ascr_ref, nbt, k * 9 * nbt)
            b = read9(bscr_ref, nbt, k * 9 * nbt)
            upd = madd(mv(a, tshift_m(rv, s)), mv(b, tshift_p(rv, s)))
            return tuple(r - lvm * u for r, u in zip(rv, upd))

        rv = lax.fori_loop(0, r_star, round_body, rv)
        dinv = read9(dinv_ref, nbt)
        return tuple(lvm * y for y in mv(dinv, rv))

    def chain_to_slots(r_chain):
        return tuple(r_chain[c * nbc:c * nbc + nbt] for c in range(3))

    if nbc > nbt:
        zpad = jnp.zeros((nbc - nbt, BLOCK), f32)

        def slots_to_chain(v):
            return jnp.concatenate([jnp.concatenate([v[c], zpad], axis=0)
                                    for c in range(3)], axis=0)
    else:
        def slots_to_chain(v):
            return jnp.concatenate(list(v), axis=0)

    def precond(r_chain):
        rs = chain_to_slots(r_chain)
        zs3 = (zero_s, zero_s, zero_s)
        attB0 = read9(ab0_ref, npb)
        attB1 = read9(ab1_ref, npb)

        def fwd_body(li, c):
            rs, y_all = c
            lvm = lvm_ref[pl.ds(li * nbt, nbt)]
            pvm = pvm_ref[pl.ds(li * npb, npb)]
            y = pcr_update(rs, lvm)
            y_all = madd(y_all, y)
            g = gather_vec(fl_blk_ref, fl_lane_ref, id2p, y, 2 * npb)
            g0 = tuple(comp[:npb] for comp in g)
            g1 = tuple(comp[npb:] for comp in g)
            corr0 = tuple(pvm * z for z in mv(attB0, g0))
            corr1 = tuple(pvm * z for z in mv(attB1, g1))
            sc0 = scatter_vec(at_blk_ref, at_lane_ref, idp, corr0, nbt,
                              row0=0, n_rows=pp)
            sc1 = scatter_vec(at_blk_ref, at_lane_ref, idp, corr1, nbt,
                              row0=pp, n_rows=pp)
            rs = tuple(r - a - b for r, a, b in zip(rs, sc0, sc1))
            return (rs, y_all)

        rs, y_all = lax.fori_loop(0, n_levels, fwd_body, (rs, zs3))

        def bwd_body(i, u_all):
            li = n_levels - 1 - i
            lvm = lvm_ref[pl.ds(li * nbt, nbt)]
            pvm = pvm_ref[pl.ds(li * npb, npb)]
            uj = gather_vec(at_blk_ref, at_lane_ref, id2p, u_all, 2 * npb)
            uj0 = tuple(comp[:npb] for comp in uj)
            uj1 = tuple(comp[npb:] for comp in uj)
            z0 = tuple(pvm * z for z in mv(m_t(attB0), uj0))
            z1 = tuple(pvm * z for z in mv(m_t(attB1), uj1))
            zs0 = scatter_vec(fl_blk_ref, fl_lane_ref, idp, z0, nbt,
                              row0=0, n_rows=pp)
            zs1 = scatter_vec(fl_blk_ref, fl_lane_ref, idp, z1, nbt,
                              row0=pp, n_rows=pp)
            zs = madd(zs0, zs1)
            u = tuple(lvm * (ya - pc)
                      for ya, pc in zip(y_all, pcr_update(zs, lvm)))
            return madd(u_all, u)

        u_all = lax.fori_loop(0, n_levels, bwd_body, zs3)
        return slots_to_chain(u_all) + r_chain * (1.0 - slotcov_ref[:])

    # ---------------- CG (state in cg_scr: x / r / p) ----------------
    def dot(a, b):
        return jnp.sum(a * b)

    def xv():
        return cg_scr[pl.ds(0, 3 * nbc)]

    def rv():
        return cg_scr[pl.ds(3 * nbc, 3 * nbc)]

    def pv():
        return cg_scr[pl.ds(6 * nbc, 3 * nbc)]

    freem = freem_ref[:]
    uk = uk_ref[:]
    b = (1.0 - freem) * uk - freem * matvec_raw(uk)
    bnorm2 = dot(freem * b, freem * b)
    tol2 = rtol * rtol * bnorm2

    cg_scr[pl.ds(0, 3 * nbc)] = freem * x0_ref[:] + (1.0 - freem) * uk
    cg_scr[pl.ds(3 * nbc, 3 * nbc)] = b - matvec(xv())
    del freem, uk, b
    z0 = precond(rv())
    rz0 = dot(rv(), z0)
    rr0 = dot(rv(), rv())
    cg_scr[pl.ds(6 * nbc, 3 * nbc)] = z0
    del z0

    def cond(s):
        rr, k, rz = s
        return jnp.logical_and(k < max_iter, rr > tol2)

    def body(s):
        rr, k, rz = s
        ap = matvec(pv())
        pap = dot(pv(), ap)
        alpha = jnp.where(pap > 0, rz / jnp.where(pap > 0, pap, 1.0), 0.0)
        cg_scr[pl.ds(0, 3 * nbc)] = xv() + alpha * pv()
        cg_scr[pl.ds(3 * nbc, 3 * nbc)] = rv() - alpha * ap
        z = precond(rv())
        rz_new = dot(rv(), z)
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
        cg_scr[pl.ds(6 * nbc, 3 * nbc)] = z + beta * pv()
        return (dot(rv(), rv()), k + 1, rz_new)

    rr, k, rz = lax.while_loop(
        cond, body, (rr0, jnp.asarray(0, jnp.int32), rz0))

    x_out_ref[:] = xv()
    sl = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    stats = jnp.where(sl == 0, k.astype(f32),
                      jnp.where(sl == 1, jnp.sqrt(rr),
                                jnp.where(sl == 2, jnp.sqrt(tol2), 0.0)))
    stats_ref[:] = stats


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------

def pallas_tree_big_solve(model, chain_packed, tree_packed, active,
                          dy_top, dy_bot, x0, cfg: FeaConfig,
                          anchored=None, tree_factor_val=None):
    """One boundary-value solve: XLA factorization + whole-CG kernel."""
    from .bc import prescribed_values
    from .chain import plan_active_masks
    from .pallas_cg import _pack_plane, _tile3, pack_vec3, unpack_vec3
    from .tree_jax import tree_factor

    plan = model.chain
    tplan = model.tree
    n = model.n_nodes
    nbc = chain_packed.cn.shape[0] // 3
    nbt = tree_packed.nbt
    npb = tree_packed.npb
    jp = chain_packed.jscal.shape[0]
    f32 = jnp.float32
    n_levels = tree_packed.n_levels
    r_star = max(tplan.meta.level_steps) if tplan.meta.level_steps else 0

    free = model.free_nodes if anchored is None \
        else jnp.logical_and(model.free_nodes, anchored)
    chain_act, jump_act = plan_active_masks(plan, active)
    cact = _tile3(_pack_plane(chain_act.astype(f32), nbc))
    jact_col = jnp.pad(jump_act.astype(f32), (0, jp - jump_act.shape[0]))
    jact = jnp.broadcast_to(jact_col[:, None], (jp, BLOCK))

    u_k = prescribed_values(model, dy_top, dy_bot).astype(f32)
    free3 = jnp.repeat(free[plan.perm].astype(f32)[:, None], 3, axis=1)
    freem = pack_vec3(free3, nbc)
    uk_p = pack_vec3(u_k[plan.perm], nbc)
    x0_p = pack_vec3(x0.astype(f32)[plan.perm], nbc)

    # factorization in XLA (exact; once per solve) — the gather-free fast
    # path when available, else the generic one
    reg_pc = max(cfg.reg, cfg.tree_reg_rel * tplan.meta.k_scale)
    if tree_factor_val is not None:
        factor = tree_factor_val
    elif getattr(model, "tree_fast", None) is not None:
        from .tree_jax import tree_factor_fast
        free_chain = free[plan.perm]
        factor = tree_factor_fast(tplan, model.tree_fast, plan, active,
                                  free, free_chain,
                                  jnp.asarray(reg_pc, f32), model.conn)
    else:
        factor = tree_factor(tplan, active, free,
                             jnp.asarray(reg_pc, f32), model.conn)
    ascr, bscr, dinv9, ab0, ab1 = _factor_planes(tplan, factor, nbt, npb,
                                                 r_star)

    kernel = functools.partial(
        _cg_big_kernel, nbc, nbt, npb, n_levels, r_star, jp,
        cfg.max_iter, np.float32(cfg.rtol), np.float32(cfg.reg))
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    tp = tree_packed
    inputs = (uk_p, x0_p, freem, cact,
              chain_packed.cn, chain_packed.ckax, chain_packed.ckbd,
              chain_packed.ab_blk, chain_packed.ab_lane,
              chain_packed.jscal, jact,
              ascr, bscr, dinv9, ab0, ab1,
              tp.lvm, tp.pvm,
              tp.fl_blk, tp.fl_lane, tp.at_blk, tp.at_lane,
              tp.idp_blk, tp.idp_lane, tp.id2p_blk, tp.id2p_lane,
              tp.slotcov)
    x_p, stats = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((3 * nbc, BLOCK), f32),
                   jax.ShapeDtypeStruct((1, 128), f32)),
        in_specs=[vmem() for _ in range(len(inputs))],
        out_specs=(vmem(), vmem()),
        scratch_shapes=[
            pltpu.VMEM((9 * nbc, BLOCK), f32),   # chain coeffs (masked)
            pltpu.VMEM((9 * nbc, BLOCK), f32),   # CG x/r/p
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(*inputs)

    x = unpack_vec3(x_p, n, nbc)[plan.inv_perm]
    iters = stats[0, 0].astype(jnp.int32)
    rnorm = stats[0, 1]
    return SolveResult(x=x.astype(model.coords.dtype), iters=iters,
                       resnorm=rnorm, converged=rnorm <= stats[0, 2])
