from .loader import (TrackMap, load_map_yaml, load_builtin, build_track_map,
                     add_obstacle, clear_obstacles, read_pgm, write_pgm,
                     occupancy_from_image, sample_free_poses)
from .edt import edt, edt_numpy
