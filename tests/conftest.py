"""Test config: force single-device CPU BEFORE jax initializes.

Multi-device sharding tests do NOT share this process: XLA's CPU backend with
--xla_force_host_platform_device_count>1 on this 1-core VM deadlocks/stalls
when several large programs compile in one process (observed: the compile
after the NMS post-processing program never finishes). Sharding tests
therefore spawn a fresh subprocess with the 8-device env — the same way the
driver exercises dryrun_multichip. See tests/test_sharding.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# strip any forced multi-device setting for the main test process
flags = os.environ.get("XLA_FLAGS", "")
flags = " ".join(
    f for f in flags.split() if "xla_force_host_platform_device_count" not in f
)
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# The axon TPU plugin overrides JAX_PLATFORMS during backend discovery; the
# config flag is the only way to actually pin CPU in that environment.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
