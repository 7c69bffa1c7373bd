"""Probe 3: take_along_axis at tile-aligned small shapes; find any form
that survives the remote compile helper."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_kernel(name, body, shapes, out_shape):
    rng = np.random.RandomState(0)
    args = []
    for shp, dt in shapes:
        if dt == jnp.int32:
            args.append(jnp.asarray(
                rng.randint(0, shp[-1], shp).astype(np.int32)))
        else:
            args.append(jnp.asarray(
                rng.randn(*shp).astype(np.float32)).astype(dt))
    try:
        out = pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct(*out_shape),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(shapes),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*args)
        out = jax.block_until_ready(out)
        print(f"{name:46s}: OK", flush=True)
        return args, out
    except Exception as e:
        print(f"{name:46s}: FAIL {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        return None, None


def taa1(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)


def taa0(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)


# single native f32 tile, indices within lane dim
args, out = try_kernel("taa axis=1 (8,128) f32", taa1,
                       [((8, 128), jnp.float32), ((8, 128), jnp.int32)],
                       ((8, 128), jnp.float32))
if out is not None:
    x, i = args
    print("    correct=",
          bool(jnp.allclose(out, jnp.take_along_axis(x, i, axis=1))))

args, out = try_kernel("taa axis=0 (8,128) f32", taa0,
                       [((8, 128), jnp.float32), ((8, 128), jnp.int32)],
                       ((8, 128), jnp.float32))
# NB indices for axis 0 must be < 8
if args is not None:
    pass

# axis=0 with valid indices
def taa0v(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:] % x_ref.shape[0],
                                   axis=0)

args, out = try_kernel("taa axis=0 (8,128) idx%8", taa0v,
                       [((8, 128), jnp.float32), ((8, 128), jnp.int32)],
                       ((8, 128), jnp.float32))
if out is not None:
    x, i = args
    print("    correct=",
          bool(jnp.allclose(out, jnp.take_along_axis(x, i % 8, axis=0))))

# bigger sublane count, axis=0 gather within 512 rows
def taa0b(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:] % x_ref.shape[0],
                                   axis=0)

args, out = try_kernel("taa axis=0 (512,128) idx%512", taa0b,
                       [((512, 128), jnp.float32), ((512, 128), jnp.int32)],
                       ((512, 128), jnp.float32))
if out is not None:
    x, i = args
    print("    correct=",
          bool(jnp.allclose(out, jnp.take_along_axis(x, i % 512, axis=0))))

# axis=1 with 1024 lanes (multi-tile on lane dim)
args, out = try_kernel("taa axis=1 (8,1024)", taa1,
                       [((8, 1024), jnp.float32), ((8, 1024), jnp.int32)],
                       ((8, 1024), jnp.float32))
if out is not None:
    x, i = args
    print("    correct=",
          bool(jnp.allclose(out, jnp.take_along_axis(x, i, axis=1))))

# axis=1, 128 lanes, 1024 sublanes
args, out = try_kernel("taa axis=1 (1024,128)", taa1,
                       [((1024, 128), jnp.float32), ((1024, 128), jnp.int32)],
                       ((1024, 128), jnp.float32))
if out is not None:
    x, i = args
    print("    correct=",
          bool(jnp.allclose(out, jnp.take_along_axis(x, i, axis=1))))
