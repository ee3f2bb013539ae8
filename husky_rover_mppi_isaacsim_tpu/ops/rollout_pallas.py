"""Fused Pallas TPU kernel for the 2.5D surface-riding rollout.

The SURVEY §7 milestone-2 kernel: the reach patch stays resident in VMEM
while each sample block scans the whole horizon in one kernel — per-step
gathers (bilinear corners, two wheel tracks) run as one-hot MXU contractions
against the patch's exact 3-way bf16 split (core/patch.py:split3), and every
intermediate (selection matrices, selected columns, headings) lives and dies
in VMEM. Replaces the XLA lax.scan path's per-step HBM round-trips and —
decisively — collapses the K=1 *optimal rollout* (MPPI_isaac.py:696-720)
from ~2.2 ms of latency-bound tiny-op dispatch into one kernel invocation.

Math mirrors ``mppi/rollout.py::rollout_25d`` step-for-step
(projection_warp.py:284-350 semantics): update_position -> corner gather ->
bilinear -> quad normal -> tangent project -> Rodrigues orientation ->
wheel-track offsets -> nearest-cell wheel heights.

Selection layout trick: the per-sample one-hot is built *transposed* —
``ohT[p, k] = (p == idx[k])`` — via ``broadcasted_iota`` over (P, KB)
compared against a (1, KB) index row, so no vector transposes are needed
anywhere: column selection is ``Z @ ohT -> (P, KB)`` on the MXU and row
extraction is an elementwise multiply + sublane reduction on the VPU.

Exactness: selection values are bit-exact (0/1 times the exact hi/mid/lo
bf16 split, f32 accumulation). Elementwise math is the same op sequence as
the XLA path, so interpret-mode results are bit-identical to the eager XLA
rollout; Mosaic-compiled results differ only by FMA contraction choices
(tested to tight tolerances in tests/test_rollout_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.patch import PatchField

WHEEL_OFFSET = 0.2  # projection_warp.py:333

_SF = dict(dt=0, res=1, x_min=2, y_min=3)          # f32 scalars
_SI = dict(i0=0, j0=1, parent_rows=2, parent_cols=3)  # int32 scalars


def _normalize3(x, y, z):
    n = jnp.sqrt(x * x + y * y + z * z)
    return x / n, y / n, z / n


def _cross(ax, ay, az, bx, by, bz):
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _kernel(sf_ref, si_ref, xy_ref, hd_ref, lin_ref, ang_ref, z3_ref,
            out_ref, *, P: int, KB: int, H: int, wheels: bool,
            pack4: bool):
    dt = sf_ref[_SF["dt"]]
    res = sf_ref[_SF["res"]]
    x_min = sf_ref[_SF["x_min"]]
    y_min = sf_ref[_SF["y_min"]]
    i0 = si_ref[_SI["i0"]]
    j0 = si_ref[_SI["j0"]]
    prows = si_ref[_SI["parent_rows"]]
    pcols = si_ref[_SI["parent_cols"]]

    zhi = z3_ref[0]
    zmid = z3_ref[1]
    zlo = z3_ref[2]
    iota_pk = jax.lax.broadcasted_iota(jnp.int32, (P, KB), 0)
    iota_p2k = jax.lax.broadcasted_iota(jnp.int32, (P, 2 * KB), 0)

    def cell_i(x):
        return jnp.trunc((x - x_min) / res).astype(jnp.int32)

    def cell_j(y):
        return (-jnp.trunc((y + y_min) / res)).astype(jnp.int32)

    def to_patch(i, j):
        # wrap-then-clamp parent semantics, then clamp into the patch
        # (core/patch.py:_normalize_index/_patch_index)
        i = jnp.clip(jnp.where(i < 0, i + pcols, i), 0, pcols - 1)
        j = jnp.clip(jnp.where(j < 0, j + prows, j), 0, prows - 1)
        return (jnp.clip(i - i0, 0, P - 1), jnp.clip(j - j0, 0, P - 1))

    def col_select_packed(*ips):
        """Z[:, ip_k] for N index rows in one 3-split matmul set: the
        (1, KB) rows pack side by side into a (P, N*KB) one-hot so the
        (P, P) patch operand streams through the MXU once per split
        instead of N times — identical MACs, 1/N the weight-load passes,
        and (decisively) ONE matmul set on the step's critical path
        (the K=16384 production config was bound by its two *dependent*
        selection groups per step, VERDICT r04 weak #3). Bit-exact: same
        splits, same 0/1 one-hot, f32 accumulation — packed lanes are
        independent columns of the same contraction."""
        n = len(ips)
        idx = jnp.concatenate(ips, axis=1)  # (1, n*KB)
        iota = (iota_p2k if n == 2
                else jax.lax.broadcasted_iota(jnp.int32, (P, n * KB), 0))
        oht = (iota == idx).astype(jnp.bfloat16)
        acc = jnp.dot(zhi, oht, preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(zmid, oht, preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(zlo, oht, preferred_element_type=jnp.float32)
        return tuple(acc[:, i * KB:(i + 1) * KB] for i in range(n))

    def row_pick(w, jp):
        """w[jp_k, k] per sample: multiply by the transposed row one-hot and
        reduce over sublanes -> (1, KB) f32."""
        m = (iota_pk == jp).astype(jnp.float32)
        return jnp.sum(w * m, axis=0, keepdims=True)

    def lookup_nearest(px, py):
        ip, jp = to_patch(cell_i(px), cell_j(py))
        (w,) = col_select_packed(ip)
        return row_pick(w, jp)

    def body(t, carry):
        # Wheel lookups are software-pipelined one step: step t's corner
        # selection matmul also carries step t-1's wheel columns (their
        # indices ride the carry), so each step issues ONE packed matmul
        # set instead of two dependent ones — the wheel selections come
        # off the critical path entirely (wheel z feeds only the critics,
        # never the dynamics, so a one-step deferral is exact).
        x, y, hx, hy, hz, lip, ljp, rip, rjp = carry
        lin = lin_ref[0, t, :][None, :]
        ang = ang_ref[0, t, :][None, :]

        # update_position (projection_warp.py:207-223)
        hx, hy, hz = _normalize3(hx, hy, hz)
        x = x + hx * (lin * dt)
        y = y + hy * (lin * dt)

        # corner gather + bilinear + normal (projection_warp.py:8-151)
        ci = cell_i(x)
        cj = cell_j(y)
        ip, jp = to_patch(ci, cj)
        ip1, jp1 = to_patch(ci + 1, cj + 1)
        if wheels and pack4:
            w_i, w_i1, w_lw, w_rw = col_select_packed(ip, ip1, lip, rip)
            lwz = row_pick(w_lw, ljp)
            rwz = row_pick(w_rw, rjp)

            @pl.when(t > 0)
            def _store_prev_wheels():
                out_ref[0, 8, t - 1, :] = lwz[0]
                out_ref[0, 11, t - 1, :] = rwz[0]
        elif pack4:
            w_i, w_i1 = col_select_packed(ip, ip1)
        else:
            # narrow form for large patches: one selection at a time keeps
            # the Mosaic stack under the 16 MB scoped-VMEM limit (a packed
            # (P, 4KB) one-hot + its f32 accumulator overflow it at
            # P >= 640 even with KB = 128)
            (w_i,) = col_select_packed(ip)
            (w_i1,) = col_select_packed(ip1)
        q00 = row_pick(w_i, jp)
        q01 = row_pick(w_i1, jp)
        q10 = row_pick(w_i, jp1)
        q11 = row_pick(w_i1, jp1)

        xn = x / res
        yn = y / res
        x2 = xn - jnp.trunc(xn)
        y2 = yn - jnp.trunc(yn)
        height = ((1.0 - x2) * (1.0 - y2) * q00 + x2 * (1.0 - y2) * q10
                  + (1.0 - x2) * y2 * q01 + x2 * y2 * q11)

        nx = -res / 2.0 * (q01 - q00 - q10 + q11)
        ny = -res / 2.0 * (q10 - q00 - q01 + q11)
        nz = res * res * jnp.ones_like(nx)
        nn = jnp.sqrt(nx * nx + ny * ny + nz * nz)
        nx, ny, nz = nx / nn, ny / nn, nz / nn

        # tangent_project (projection_warp.py:181-190)
        dt_h = hx * nx + hy * ny + hz * nz
        px, py, pz = hx - dt_h * nx, hy - dt_h * ny, hz - dt_h * nz
        pn = jnp.sqrt(px * px + py * py + pz * pz)
        px, py, pz = px / pn, py / pn, pz / pn

        # update_orientation: normalize + Rodrigues about the normal +
        # normalize (projection_warp.py:225-248)
        ux, uy, uz = _normalize3(px, py, pz)
        theta = ang * dt
        ct = jnp.cos(theta)
        st = jnp.sin(theta)
        cx, cy, cz = _cross(nx, ny, nz, ux, uy, uz)
        ad = nx * ux + ny * uy + nz * uz
        ohx = ux * ct + cx * st + nx * ad * (1.0 - ct)
        ohy = uy * ct + cy * st + ny * ad * (1.0 - ct)
        ohz = uz * ct + cz * st + nz * ad * (1.0 - ct)
        ohx, ohy, ohz = _normalize3(ohx, ohy, ohz)

        out_ref[0, 0, t, :] = x[0]
        out_ref[0, 1, t, :] = y[0]
        out_ref[0, 2, t, :] = height[0]
        out_ref[0, 3, t, :] = ohx[0]
        out_ref[0, 4, t, :] = ohy[0]
        out_ref[0, 5, t, :] = ohz[0]
        if wheels:
            # wheel tracks (projection_warp.py:332-348) — skipped entirely
            # in body-slope-critic mode, where lw/rw are never consumed.
            # pack4: positions store now, the z lookups ride the NEXT
            # step's packed matmul (indices into the carry) and flush after
            # the loop for t = H-1. Narrow form: look up in-step.
            wx, wy, _wz = _cross(nx, ny, nz, ohx, ohy, ohz)
            lwx = x + WHEEL_OFFSET * wx
            lwy = y + WHEEL_OFFSET * wy
            rwx = x - WHEEL_OFFSET * wx
            rwy = y - WHEEL_OFFSET * wy
            lip, ljp = to_patch(cell_i(lwx), cell_j(lwy))
            rip, rjp = to_patch(cell_i(rwx), cell_j(rwy))
            out_ref[0, 6, t, :] = lwx[0]
            out_ref[0, 7, t, :] = lwy[0]
            out_ref[0, 9, t, :] = rwx[0]
            out_ref[0, 10, t, :] = rwy[0]
            if not pack4:
                out_ref[0, 8, t, :] = row_pick(
                    col_select_packed(lip)[0], ljp)[0]
                out_ref[0, 11, t, :] = row_pick(
                    col_select_packed(rip)[0], rjp)[0]
        return (x, y, ohx, ohy, ohz, lip, ljp, rip, rjp)

    x = xy_ref[0, 0, :][None, :]
    y = xy_ref[0, 1, :][None, :]
    hx = hd_ref[0, 0, :][None, :]
    hy = hd_ref[0, 1, :][None, :]
    hz = hd_ref[0, 2, :][None, :]
    zero_i = jnp.zeros((1, KB), jnp.int32)
    carry = jax.lax.fori_loop(
        0, H, body, (x, y, hx, hy, hz, zero_i, zero_i, zero_i, zero_i))
    if wheels and pack4:
        # flush the last step's deferred wheel lookups
        _, _, _, _, _, lip, ljp, rip, rjp = carry
        w_lw, w_rw = col_select_packed(lip, rip)
        out_ref[0, 8, H - 1, :] = row_pick(w_lw, ljp)[0]
        out_ref[0, 11, H - 1, :] = row_pick(w_rw, rjp)[0]


@functools.partial(jax.jit,
                   static_argnames=("block_k", "interpret", "wheels"))
def rollout_chunk(
    pf: PatchField,
    x: Array,          # (K,) start x per sample
    y: Array,          # (K,)
    heading: Array,    # (K, 3) tangent-projected heading entering the chunk
    lin: Array,        # (K, H_chunk)
    ang: Array,        # (K, H_chunk)
    dt,
    block_k: int = 128,
    interpret: bool = False,
    wheels: bool = True,
):
    """Run one horizon chunk for all K samples through the fused kernel.

    Returns ``(traj, headings, lw, rw)`` each ``(K, H_chunk, 3)`` — the same
    contract as the per-chunk scan inside ``mppi/rollout.py::rollout_25d``.
    K is padded up to a multiple of ``block_k`` (padded lanes compute
    clamped garbage that is sliced off). float32 only (the 3-split selection
    is a float32 decomposition). With ``wheels=False`` the wheel-track
    lookups are skipped (half the selection matmuls) and ``lw = rw = traj``
    — the body-slope-critic configuration (MPPIConfig.slope_critic)."""
    if pf.z3 is None:
        raise ValueError("pallas rollout requires a float32 patch (z3 split)")
    K, H = lin.shape
    P = pf.size
    KB = block_k
    Kp = -(-K // KB) * KB
    G = Kp // KB

    def pad(a, fill=0.0):
        return jnp.pad(a, ((0, Kp - K),) + ((0, 0),) * (a.ndim - 1),
                       constant_values=fill)

    # (G, 2|3, KB) state rows; (G, H, KB) inputs — lanes = samples.
    xy = jnp.stack([pad(x).reshape(G, KB), pad(y).reshape(G, KB)], axis=1)
    hd = pad(heading).reshape(G, KB, 3).swapaxes(1, 2)
    lin_b = pad(lin).reshape(G, KB, H).swapaxes(1, 2)
    ang_b = pad(ang).reshape(G, KB, H).swapaxes(1, 2)

    sf = jnp.stack([
        jnp.asarray(dt, jnp.float32),
        pf.resolution.astype(jnp.float32),
        pf.x_min.astype(jnp.float32),
        pf.y_min.astype(jnp.float32),
    ])
    si = jnp.stack([
        pf.i0.astype(jnp.int32),
        pf.j0.astype(jnp.int32),
        jnp.asarray(pf.parent_rows, jnp.int32),
        jnp.asarray(pf.parent_cols, jnp.int32),
    ])

    NCH = 12 if wheels else 6
    # packed selections win on throughput but their (P, 4KB) one-hot +
    # f32 accumulator must fit the 16 MB scoped-VMEM stack next to the
    # 3-split patch; large streamed-terrain patches take the narrow form
    pack4 = P <= 384
    out = pl.pallas_call(
        functools.partial(_kernel, P=P, KB=KB, H=H, wheels=wheels,
                          pack4=pack4),
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2, KB), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, KB), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, KB), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, KB), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, P, P), lambda g: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NCH, H, KB), lambda g: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, NCH, H, KB), jnp.float32),
        interpret=interpret,
    )(sf, si, xy, hd, lin_b, ang_b, pf.z3)

    # (G, NCH, H, KB) -> (K, NCH, H)
    flat = jnp.moveaxis(out, 3, 1).reshape(G * KB, NCH, H)[:K]

    def comp(a, b, c):
        return jnp.stack([flat[:, a, :], flat[:, b, :], flat[:, c, :]],
                         axis=-1)

    traj = comp(0, 1, 2)
    headings = comp(3, 4, 5)
    if not wheels:
        return traj, headings, traj, traj
    lw = comp(6, 7, 8)
    rw = comp(9, 10, 11)
    return traj, headings, lw, rw
