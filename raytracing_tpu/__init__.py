"""raytracing_tpu: a TPU-native path-tracing framework (JAX/XLA/Pallas).

A from-scratch re-design of the capabilities of the reference C++ project
``adihodos/raytracing.cpp`` (an interactive multithreaded CPU "Ray Tracing in
One Weekend" renderer) for TPU hardware:

  core/      math, color pipe, counter-based RNG, thin-lens camera   (L1-L2)
  scene/     SoA sphere world, JSON world config, cover-scene build  (L2)
  ops/       intersection + scatter kernels (XLA and Pallas paths)   (hot ops)
  models/    wavefront integrator(s)                                 (L2-L3)
  parallel/  device-mesh sharding of the (pixel, sample) grid        (L3)
  runtime/   progressive renderer, display, logging, CLI             (L3-L6)
  utils/     PNG IO, profiling helpers                               (infra)

See SURVEY.md at the repo root for the reference layer map this mirrors.
"""

import os as _os


def _enable_compilation_cache() -> None:
    """Persistent XLA/Mosaic compilation cache (opt-out via env).

    The fused render kernels take minutes to compile per image shape; caching
    the executables on disk makes every process after the first start
    instantly. Set ``RT_NO_COMPILE_CACHE=1`` or pre-set
    ``JAX_COMPILATION_CACHE_DIR`` to control this.
    """
    if _os.environ.get("RT_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update(
                "jax_compilation_cache_dir",
                _os.path.expanduser("~/.cache/raytracing_tpu/xla"),
            )
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()

from .core.camera import CameraParameters, DerivedCamera, derive
from .scene.config import (
    WorldDefinition,
    build_world,
    load_and_build,
    load_world,
    make_world_basic,
    make_world_mesh,
    make_world_meshes,
    make_world_stress,
    make_world_textured,
)
from .scene.types import MaterialKind, Scene, SceneBuilder
from .runtime.renderer import Renderer, RenderProgress

__version__ = "0.1.0"

__all__ = [
    "CameraParameters",
    "DerivedCamera",
    "derive",
    "WorldDefinition",
    "build_world",
    "load_and_build",
    "load_world",
    "make_world_basic",
    "make_world_mesh",
    "make_world_meshes",
    "make_world_stress",
    "make_world_textured",
    "MaterialKind",
    "Scene",
    "SceneBuilder",
    "Renderer",
    "RenderProgress",
    "__version__",
]
