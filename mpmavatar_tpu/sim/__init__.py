from .solver import (MPMSolver, SimTransform, reset_density, set_E_nu,
                     set_parameters_dict, set_parameters_in_box)  # noqa: F401
