from vrenderer_pathtracer_tpu.utils.profiling import (
    RenderStats,
    measure_renderer,
    profiler_trace,
    timeit,
)

__all__ = ["RenderStats", "measure_renderer", "profiler_trace", "timeit"]

from vrenderer_pathtracer_tpu.utils.debug import (  # noqa: E402
    assert_finite_tree,
    checked,
    interpret_kernels,
)

__all__ += ["assert_finite_tree", "checked", "interpret_kernels"]
