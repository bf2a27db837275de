from .analytic import ExpSeriesProblem, ExpSeriesMultiProblem
from .diffusion import (DiffusionProblem, solve_diffusion,
                        solve_diffusion_outputs, thomas_solve)
from .hodgkin_huxley import HodgkinHuxleyProblem
