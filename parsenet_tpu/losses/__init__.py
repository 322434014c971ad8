"""Losses: triplet embedding, primitive NLL, spline losses."""
from .embedding import primitive_nll_loss, triplet_loss
from .spline import (control_points_permute_closed_reg_loss,
                     control_points_permute_reg_loss, laplacian_loss,
                     spline_reconstruction_loss,
                     spline_reconstruction_loss_one_sided)
