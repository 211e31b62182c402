from .geometry import normalize_into_unit_ball, project_sphere
from .glimpse import extract_glimpse, extract_glimpse_batch
from .raycast import contact_cells, lidar_directions, raycast_grid
