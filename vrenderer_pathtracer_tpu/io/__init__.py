from vrenderer_pathtracer_tpu.io.images import (
    load_exr,
    load_image,
    load_merl,
    load_obj,
    save_depth_png,
    save_png,
    write_exr,
)

__all__ = [
    "load_exr", "load_image", "load_merl", "load_obj",
    "save_depth_png", "save_png", "write_exr",
]
