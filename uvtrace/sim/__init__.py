from uvtrace.sim.params import SimParams, ViewMode
from uvtrace.sim.simulator import Simulator
