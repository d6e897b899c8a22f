"""Probe: does pltpu.roll accept a TRACED (dynamic) shift on the lane axis?

Needed for the element-exact pack kernel (carry-row alignment). Run on CPU
(interpret) and on the device.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(s_ref, x_ref, o_ref):
    c = s_ref[0]
    o_ref[...] = pltpu.roll(x_ref[...], c, 1)


def run(interpret):
    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    for c in (0, 1, 37, 127):
        out = pl.pallas_call(
            _kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            interpret=interpret,
        )(jnp.asarray([c], jnp.int32), x)
        ref = np.roll(np.asarray(x), c, axis=1)
        ok = np.array_equal(np.asarray(out), ref)
        print(f"interpret={interpret} shift={c}: {'OK' if ok else 'MISMATCH'}")
        if not ok:
            return False
    return True


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "device"
    if mode == "cpu":
        jax.config.update("jax_platforms", "cpu")
        run(interpret=True)
    else:
        run(interpret=False)
