"""Image I/O: PNG/LDR via PIL, EXR/MERL/OBJ via the native library.

Replaces the reference's Qt/OpenEXR/Assimp ingestion (QImage at
``src/NGLScene.cpp:403-424``, RgbaInputFile at ``:368-401``, Assimp at
``src/MeshLoader.cpp:19``) with PIL for LDR images and the dependency-free
C++ loaders in ``native/`` for everything else.
"""

from __future__ import annotations

import numpy as np

from vrenderer_pathtracer_tpu.native import (  # noqa: F401  (re-exports)
    load_exr,
    load_fbx,
    load_merl,
    load_mesh_file,
    load_obj,
    load_ply,
    write_exr,
)


def load_image(path) -> np.ndarray:
    """LDR image -> [H,W,3] float32 in [0,1] (no gamma handling here; the
    Renderer linearises diffuse maps at load, reference parity)."""
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def save_png(path, img01, flip_y: bool = True) -> None:
    """[H,W,3] float in [0,1] -> 8-bit PNG.  ``flip_y`` converts the
    renderer's y-up row order to image convention."""
    from PIL import Image

    arr = np.asarray(img01)
    if flip_y:
        arr = arr[::-1]
    arr = (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(arr).save(path)


def save_depth_png(path, depth, flip_y: bool = True) -> None:
    """Depth channel the reference way: (1 - depth) greyscale
    (``cuda/src/PathTracer.cu:850-851``)."""
    d = np.asarray(depth)
    save_png(path, np.repeat((1.0 - d)[..., None], 3, axis=-1), flip_y=flip_y)
