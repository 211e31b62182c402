from .dataset import BankImageDataset, ImageDataset
from .circle_square import (
    DoubleCircleSquareDataset,
    circle_square_object_position_and_label,
    double_circle_square_positions,
    make_circle_square_bank,
)
