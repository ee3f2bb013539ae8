"""Microbenchmark gather strategies for the rollout hot path.

The measured truth (profile_true_rate.py): XLA lowers the K-index corner
gathers to ~12-17 ns/element serialized loads => 10.5 ms per K=1000xH=100
control loop. Candidate replacements, all timed with transfer-synced slope
timing (the axon relay ACKs block_until_ready early):

  gather   : current z[j, i] indexing
  onehot   : row-selection matmuls (K,P)@(P,P) on the MXU + one-hot column
             dots (bit-exact selection)
  rowgather: lax.gather of whole rows (slice_sizes=(1,P)) + one-hot col dots
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

P = 256  # patch size


def make_patch(key, p=P):
    return jax.random.uniform(key, (p, p), jnp.float32, 0.0, 10.0)


def corners_gather(z, i, j):
    q00 = z[j, i]
    q01 = z[j, i + 1]
    q10 = z[j + 1, i]
    q11 = z[j + 1, i + 1]
    return q00, q01, q10, q11


def onehot_rows(j, p, dtype):
    # (K, P) one-hot; rows built on VPU, exact 0/1 values
    iota = jax.lax.broadcasted_iota(jnp.int32, (j.shape[0], p), 1)
    return (iota == j[:, None]).astype(dtype)


def corners_onehot(z, i, j):
    p = z.shape[0]
    dt = z.dtype
    rj = onehot_rows(j, p, dt)        # selects row j
    rj1 = onehot_rows(j + 1, p, dt)
    a = rj @ z                         # (K, P) row j
    b = rj1 @ z                        # (K, P) row j+1
    ci = onehot_rows(i, p, dt)
    ci1 = onehot_rows(i + 1, p, dt)
    q00 = jnp.sum(a * ci, axis=1)
    q01 = jnp.sum(a * ci1, axis=1)
    q10 = jnp.sum(b * ci, axis=1)
    q11 = jnp.sum(b * ci1, axis=1)
    return q00, q01, q10, q11


def corners_rowgather(z, i, j):
    p = z.shape[0]
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,)
    )
    rows = jax.lax.gather(z, j[:, None], dn, slice_sizes=(2, p),
                          mode=jax.lax.GatherScatterMode.CLIP)  # (K, 2, P)
    dt = z.dtype
    ci = onehot_rows(i, p, dt)
    ci1 = onehot_rows(i + 1, p, dt)
    q00 = jnp.sum(rows[:, 0] * ci, axis=1)
    q01 = jnp.sum(rows[:, 0] * ci1, axis=1)
    q10 = jnp.sum(rows[:, 1] * ci, axis=1)
    q11 = jnp.sum(rows[:, 1] * ci1, axis=1)
    return q00, q01, q10, q11


def chain(fn, z, n_steps, i0, j0):
    """n_steps dependent corner lookups (mimics the horizon scan's serial
    dependence): indices for step t+1 derive from step t's values."""
    p = z.shape[0]

    def body(carry, _):
        i, j = carry
        q00, q01, q10, q11 = fn(z, i, j)
        # index update depending on gathered values (keeps the chain serial)
        di = (q00 + q01 > q10 + q11).astype(jnp.int32)
        i = jnp.clip(i + di, 0, p - 2)
        j = jnp.clip(j + 1 - di, 0, p - 2)
        return (i, j), None

    (i, j), _ = jax.lax.scan(body, (i0, j0), None, length=n_steps)
    return i.sum() + j.sum()


def timed(run, *args):
    out = run(*args)
    return float(np.asarray(out))


def slope_time(make_run, ns=(16, 64)):
    ts = {}
    for n in ns:
        run = make_run(n)
        timed(run)  # compile
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            timed(run)
            reps.append(time.perf_counter() - t0)
        ts[n] = min(reps)
    return (ts[ns[1]] - ts[ns[0]]) / (ns[1] - ns[0])


def main():
    key = jax.random.key(0)
    z = make_patch(key)

    for K in (1000, 16384):
        i0 = jax.random.randint(jax.random.key(1), (K,), 0, P - 2)
        j0 = jax.random.randint(jax.random.key(2), (K,), 0, P - 2)

        # correctness first
        ref = corners_gather(z, i0, j0)
        for name, fn in (("onehot", corners_onehot),
                         ("rowgather", corners_rowgather)):
            got = fn(z, i0, j0)
            errs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
                    for a, b in zip(ref, got)]
            print(f"K={K} {name}: max abs err vs gather = {max(errs):.3e}")

        for name, fn in (("gather", corners_gather),
                         ("onehot", corners_onehot),
                         ("rowgather", corners_rowgather)):
            def make_run(n, fn=fn):
                f = jax.jit(partial(chain, fn, z, n))
                return lambda: f(i0, j0)
            per_step = slope_time(make_run)
            print(f"K={K:6d} {name:9s}: {per_step*1e6:9.2f} us/step "
                  f"({per_step/K*1e9:7.2f} ns/sample-step)")


if __name__ == "__main__":
    main()
