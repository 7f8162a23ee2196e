from uvtrace.diff.estimator import (
    DiffScene,
    bounce_irradiance,
    irradiance,
    make_diff_scene,
    one_bounce_irradiance,
    route_dose,
)
from uvtrace.diff.image import ImagePlan, dose_image, plan_dose_image
from uvtrace.diff.optimize import RouteOptResult, optimize_route
