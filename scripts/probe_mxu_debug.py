"""Dump bounce-0 gathered albedo-green words (x65535) from the REAL kernel,
radix vs MXU, on identical rays."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["RT_MXU_DEBUG"] = "1"
import numpy as np
import jax, jax.numpy as jnp
import raytracing_tpu as rt
from raytracing_tpu.ops.pallas import trace as T

world = rt.load_world("data/config/world.config.json")
_, scene = rt.build_world(world)
rng = np.random.default_rng(1)
o = np.tile(np.array([[13.0, 2.0, 3.0]], np.float32), (1024, 1))
d = (np.array([[-13.0, -2.0, -3.0]], np.float32)
     + rng.normal(0, 0.6, (1024, 3)).astype(np.float32))
rad, stats = T.trace_rays_fused(
    scene, jnp.asarray(o), jnp.asarray(d), jnp.int32(7), jnp.int32(0), 2,
    interpret=jax.devices()[0].platform not in ("tpu", "axon"))
np.save(sys.argv[1], np.asarray(stats))
print("saved", sys.argv[1], np.asarray(stats).shape)
