from .solver import (WalkSettings, WostScene, estimate_solution,  # noqa: F401
                     estimate_solution_and_gradient)
