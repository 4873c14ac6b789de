"""HW probe: radiance parity radix vs MXU gather through the real kernel
(trace_rays_fused, while_loop included), bisected by max_depth."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
import raytracing_tpu as rt
from raytracing_tpu.ops.pallas import trace as T

def run(depth):
    world = rt.load_world("data/config/world.config.json")
    _, scene = rt.build_world(world)
    rng = np.random.default_rng(1)
    o = np.tile(np.array([[13.0, 2.0, 3.0]], np.float32), (1024, 1))
    d = (np.array([[-13.0, -2.0, -3.0]], np.float32)
         + rng.normal(0, 0.6, (1024, 3)).astype(np.float32))
    rad, seg = T.trace_rays_fused(
        scene, jnp.asarray(o), jnp.asarray(d), jnp.int32(7), jnp.int32(0),
        depth, interpret=jax.devices()[0].platform not in ("tpu", "axon"))
    return np.asarray(rad), int(seg)

if __name__ == "__main__":
    depth = int(sys.argv[1])
    rad, seg = run(depth)
    import hashlib
    print(f"depth={depth} seg={seg} gather={os.environ.get('RT_GATHER','mxu')} "
          f"md5={hashlib.md5(rad.tobytes()).hexdigest()} sum={rad.sum():.6f}")
