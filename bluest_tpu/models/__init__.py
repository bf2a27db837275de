from .analytic import ExpSeriesProblem, ExpSeriesMultiProblem
from .diffusion import (DiffusionProblem, solve_diffusion,
                        solve_diffusion_outputs, thomas_solve)
from .hodgkin_huxley import HodgkinHuxleyProblem
from .matern2d import Matern2DProblem, sample_matern2d, matern2d_outputs
