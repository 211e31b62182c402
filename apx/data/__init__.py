from .dataset import BankImageDataset, ImageDataset
from .floor_map import (
    MapBank,
    generate_maze_map,
    generate_rooms_map,
    make_maze_bank,
    make_rooms_bank,
)
from .circle_square import (
    DoubleCircleSquareDataset,
    circle_square_object_position_and_label,
    double_circle_square_positions,
    make_circle_square_bank,
)
from .stream import (
    BankRotator,
    BufferedIterator,
    DataLoader,
    DatasetBatchIterator,
    DatasetIterator,
)
from .huggingface import load_hf_image_bank, synthetic_image_bank
