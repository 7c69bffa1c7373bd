"""Probe 2: pin down the exact dynamic-gather form Mosaic accepts."""

from __future__ import annotations

import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_kernel(name, body, shapes, out_shape, verbose=False):
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
        print(f"{name:44s}: OK", flush=True)
        return args, out
    except Exception as e:
        msg = traceback.format_exc() if verbose else \
            f"{type(e).__name__}: {str(e)[:160]}"
        print(f"{name:44s}: FAIL {msg}", flush=True)
        return None, None


S, C, W = 1024, 16, 1024

# A: take_along_axis axis=1, idx full shape (C, S) -> permute lanes per row
def a_body(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

args, out = try_kernel("taa axis=1 idx(C,S) f32", a_body,
                       [((C, S), jnp.float32), ((C, S), jnp.int32)],
                       ((C, S), jnp.float32))
if out is not None:
    x, i = args
    ok = bool(jnp.allclose(out, jnp.take_along_axis(x, i, axis=1)))
    print(f"    correct={ok}")

# B: same in bf16
def b_body(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

try_kernel("taa axis=1 idx(C,S) bf16", b_body,
           [((C, S), jnp.bfloat16), ((C, S), jnp.int32)],
           ((C, S), jnp.bfloat16))

# C: take_along_axis axis=0 (sublanes), x (S, C), idx (S, C)
def c_body(x_ref, i_ref, o_ref):
    i = jnp.minimum(i_ref[:], x_ref.shape[0] - 1)
    o_ref[:] = jnp.take_along_axis(x_ref[:], i, axis=0)

args, out = try_kernel("taa axis=0 idx(S,C) f32", c_body,
                       [((S, C), jnp.float32), ((S, C), jnp.int32)],
                       ((S, C), jnp.float32))
if out is not None:
    x, i = args
    ik = jnp.minimum(i, S - 1)
    ok = bool(jnp.allclose(out, jnp.take_along_axis(x, ik, axis=0)))
    print(f"    correct={ok}")

# D: output wider than input lanes: x (C, S) idx (C, 2S)
def d_body(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

try_kernel("taa axis=1 idx(C,2S) grow", d_body,
           [((C, S), jnp.float32), ((C, 2 * S), jnp.int32)],
           ((C, 2 * S), jnp.float32))

# E: 1D-ish gather via 2D: x (1, S), idx (1, W)
def e_body(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

try_kernel("taa axis=1 x(1,S) idx(1,W)", e_body,
           [((1, S), jnp.float32), ((1, W), jnp.int32)],
           ((1, W), jnp.float32))

# F: x (8, S) idx (8, S) but idx rows identical broadcast trick
def f_body(x_ref, i_ref, o_ref):
    idx = jnp.broadcast_to(i_ref[0:1, :], x_ref.shape)
    o_ref[:] = jnp.take_along_axis(x_ref[:], idx, axis=1)

try_kernel("taa axis=1 idx bcast row", f_body,
           [((C, S), jnp.float32), ((1, S), jnp.int32)],
           ((C, S), jnp.float32))

# G: lax.gather-style x[i] with dynamic i vector on sublanes: x (S, C), idx (W,) -> rows
def g_body(x_ref, i_ref, o_ref):
    o_ref[:] = x_ref[:][i_ref[0, :], :]

try_kernel("x[idx,:] sublane vec idx", g_body,
           [((S, C), jnp.float32), ((1, W), jnp.int32)],
           ((W, C), jnp.float32))
