"""Model zoo: ready-made lens scenes and the differentiable lens model."""
from .scenes import (  # noqa: F401
    LensScene,
    sphere_lens_scene,
    ellipsoid_lens_scene,
    robot_lens_scene,
    dimpled_lens_scene,
)
from .lens_model import (  # noqa: F401
    LensParams,
    lens_forward,
    lens_loss,
    make_opt_train_step,
    make_train_step,
)
from .fit import fit_lens, fit_emitter_lens, emitter_rays  # noqa: F401
