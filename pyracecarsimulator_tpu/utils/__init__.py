from .profiling import trace, timed_loop, rays_per_second
from .checkpoint import save_npz, load_npz, save_orbax, load_orbax
from .debug import checked
