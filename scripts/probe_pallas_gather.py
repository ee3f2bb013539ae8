"""Does Mosaic/Pallas on this toolchain support per-lane dynamic gather from
a VMEM-resident table? Try several formulations; print which compile and
whether they return correct values."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 256
K = 1024


def try_variant(name, kernel):
    table = jnp.arange(P * P, dtype=jnp.float32).reshape(P, P)
    idx_i = jax.random.randint(jax.random.key(0), (K,), 0, P).astype(jnp.int32)
    idx_j = jax.random.randint(jax.random.key(1), (K,), 0, P).astype(jnp.int32)
    want = np.asarray(table)[np.asarray(idx_j), np.asarray(idx_i)]
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((K,), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx_i, idx_j)
        got = np.asarray(out)
        ok = np.array_equal(got, want)
        print(f"{name}: COMPILED, correct={ok}")
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:140]
        print(f"{name}: FAILED — {msg}")


def k_flat_take(table_ref, i_ref, j_ref, o_ref):
    flat = table_ref[:].reshape(P * P)
    lin = j_ref[:] * P + i_ref[:]
    o_ref[:] = jnp.take(flat, lin, axis=0)


def k_getitem(table_ref, i_ref, j_ref, o_ref):
    o_ref[:] = table_ref[:][j_ref[:], i_ref[:]]


def k_take_along(table_ref, i_ref, j_ref, o_ref):
    rows = jnp.take(table_ref[:], j_ref[:], axis=0)          # (K, P)
    o_ref[:] = jnp.take_along_axis(rows, i_ref[:][:, None], axis=1)[:, 0]


def main():
    try_variant("flat jnp.take", k_flat_take)
    try_variant("advanced getitem", k_getitem)
    try_variant("take rows + take_along_axis", k_take_along)


if __name__ == "__main__":
    main()
