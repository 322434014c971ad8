"""Masked per-shape fitting pipeline (see fitting.pipeline)."""
from .pipeline import (FittingLossOut, fitting_loss_shape, make_spline_apply,
                       weights_normalize)
