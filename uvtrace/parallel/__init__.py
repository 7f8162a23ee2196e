from uvtrace.parallel.multihost import make_2d_mesh
from uvtrace.parallel.sharded import (
    RAY_AXIS,
    TEXEL_AXIS,
    make_ray_mesh,
    mesh_shape,
    sharded_launch_fn,
)
