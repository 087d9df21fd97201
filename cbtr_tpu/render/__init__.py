"""Rendering: ray generation, lens imaging, differentiable splatting."""
from .camera import ortho_ray_grid, pinhole_ray_grid, angle_sweep_rays  # noqa: F401
from .emitters import DeviceEmitter, UniformHemisphere  # noqa: F401
from .render import (  # noqa: F401
    render_emitter_image_device,
    render_lens_image,
    render_surface_normals,
    splat_bilinear,
    screen_hits,
)
