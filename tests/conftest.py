import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware (SURVEY.md §4 implication: fake-cluster testing).
#
# NOTE: the axon TPU plugin overrides the JAX_PLATFORMS env var, so the
# platform must be forced through jax.config *before* any backend init.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
