from .solvers import (
    FlowUniPCMultistepScheduler,
    FlowDPMSolverMultistepScheduler,
    FlowMatchScheduler,
    get_sampling_sigmas,
    shift_sigmas,
)
from .flow_match import (
    compute_density_for_timestep_sampling,
    sigmas_for_timesteps,
    flow_match_target,
    flow_match_noisy,
)

__all__ = [
    "FlowUniPCMultistepScheduler",
    "FlowDPMSolverMultistepScheduler",
    "FlowMatchScheduler",
    "get_sampling_sigmas",
    "shift_sigmas",
    "compute_density_for_timestep_sampling",
    "sigmas_for_timesteps",
    "flow_match_target",
    "flow_match_noisy",
]
