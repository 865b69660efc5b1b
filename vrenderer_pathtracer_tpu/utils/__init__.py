from vrenderer_pathtracer_tpu.utils.profiling import (
    RenderStats,
    measure_renderer,
    profiler_trace,
    timeit,
)

__all__ = ["RenderStats", "measure_renderer", "profiler_trace", "timeit"]
