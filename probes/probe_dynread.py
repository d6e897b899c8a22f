"""Probe: dynamic-start sublane read from VMEM (x[pl.ds(dyn, 1), :]) and
dynamic sublane roll -- candidates for the exact-pack carry extraction."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_read(s_ref, x_ref, o_ref):
    r = s_ref[0]
    o_ref[...] = x_ref[pl.ds(r, 1), :]


def _kernel_roll0(s_ref, x_ref, o_ref):
    r = s_ref[0]
    o_ref[...] = pltpu.roll(x_ref[...], (x_ref.shape[0] - r) % x_ref.shape[0], 0)[0:1, :]


def run(kern, name, interpret):
    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    for r in (0, 3, 7):
        try:
            out = pl.pallas_call(
                kern,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
                interpret=interpret,
            )(jnp.asarray([r], jnp.int32), x)
        except Exception as e:  # noqa: BLE001
            print(f"{name} interpret={interpret} r={r}: RAISED {type(e).__name__}: {e}"[:300])
            return
        ref = np.asarray(x)[r:r + 1]
        ok = np.array_equal(np.asarray(out), ref)
        print(f"{name} interpret={interpret} r={r}: {'OK' if ok else 'MISMATCH'}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "device"
    if mode == "cpu":
        jax.config.update("jax_platforms", "cpu")
        run(_kernel_read, "dynread", True)
        run(_kernel_roll0, "dynroll0", True)
    else:
        run(_kernel_read, "dynread", False)
        run(_kernel_roll0, "dynroll0", False)
