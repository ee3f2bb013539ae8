"""Is one-hot MXU selection bit-exact under Precision.HIGHEST, and what does
it cost vs the default bf16 pass?"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

P = 256


def onehot_rows(j, p, dtype):
    iota = jax.lax.broadcasted_iota(jnp.int32, (j.shape[0], p), 1)
    return (iota == j[:, None]).astype(dtype)


def select_rows(z, j, precision):
    r = onehot_rows(j, z.shape[0], z.dtype)
    return jax.lax.dot(r, z, precision_config=None) if False else jnp.matmul(
        r, z, precision=precision)


def chain(precision, z, n_steps, i0, j0):
    p = z.shape[0]

    def body(carry, _):
        i, j = carry
        a = select_rows(z, j, precision)       # row j
        b = select_rows(z, j + 1, precision)   # row j+1
        ci = onehot_rows(i, p, z.dtype)
        ci1 = onehot_rows(i + 1, p, z.dtype)
        q00 = jnp.sum(a * ci, axis=1)
        q01 = jnp.sum(a * ci1, axis=1)
        q10 = jnp.sum(b * ci, axis=1)
        q11 = jnp.sum(b * ci1, axis=1)
        di = (q00 + q01 > q10 + q11).astype(jnp.int32)
        i = jnp.clip(i + di, 0, p - 2)
        j = jnp.clip(j + 1 - di, 0, p - 2)
        return (i, j), None

    (i, j), _ = jax.lax.scan(body, (i0, j0), None, length=n_steps)
    return i.sum() + j.sum()


def main():
    key = jax.random.key(0)
    z = jax.random.uniform(key, (P, P), jnp.float32, 0.0, 10.0)

    for K in (1000, 16384):
        i0 = jax.random.randint(jax.random.key(1), (K,), 0, P - 2)
        j0 = jax.random.randint(jax.random.key(2), (K,), 0, P - 2)

        ref = np.asarray(z)[np.asarray(j0), np.asarray(i0)]
        for prec in ("default", "float32", "highest"):
            got = np.asarray(
                jnp.sum(select_rows(z, j0, prec) * onehot_rows(i0, P, z.dtype),
                        axis=1))
            bitexact = np.array_equal(got, ref)
            print(f"K={K} precision={prec:8s}: max err "
                  f"{np.abs(got - ref).max():.3e}  bit-exact={bitexact}")

        for prec in ("default", "highest"):
            ts = {}
            for n in (16, 64):
                f = jax.jit(partial(chain, prec, z, n))
                float(np.asarray(f(i0, j0)))
                reps = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(np.asarray(f(i0, j0)))
                    reps.append(time.perf_counter() - t0)
                ts[n] = min(reps)
            per = (ts[64] - ts[16]) / 48
            print(f"K={K:6d} precision={prec:8s}: {per*1e6:9.2f} us/step")


if __name__ == "__main__":
    main()
