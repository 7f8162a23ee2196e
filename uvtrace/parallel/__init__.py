from uvtrace.parallel.sharded import (
    RAY_AXIS,
    make_ray_mesh,
    sharded_launch_counts,
    sharded_sim_step,
)
