from .raymarch_xla import march_rays, scan_poses, beam_angles
from .raycast_segments import raycast_all, raycast_tiled, scan_poses_segments
from .raycast_grad import raycast_all_diff, raycast_tiled_diff
from .raycast_pallas import raycast_pallas
from .noise import add_scan_noise
