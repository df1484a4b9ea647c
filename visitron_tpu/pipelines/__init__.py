from visitron_tpu.pipelines.rendering import (
    SkyboxRenderer,
    rasterize_cubemap,
    sample_cubemap,
    view_ray_grid,
)

__all__ = [
    "SkyboxRenderer",
    "rasterize_cubemap",
    "sample_cubemap",
    "view_ray_grid",
]
