"""Networks: DGCNN segmentation net and SplineNet decoder."""
from .dgcnn import DGCNNEncoder, EdgeConv, PrimitivesEmbedding
from .splinenet import SplineNet
