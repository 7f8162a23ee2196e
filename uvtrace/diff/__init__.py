from uvtrace.diff.estimator import DiffScene, irradiance, make_diff_scene, route_dose
from uvtrace.diff.optimize import RouteOptResult, optimize_route
