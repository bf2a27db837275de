from .analytic import ExpSeriesProblem, ExpSeriesMultiProblem
from .diffusion import DiffusionProblem, solve_diffusion, thomas_solve
from .hodgkin_huxley import HodgkinHuxleyProblem
