from . import raycast, dynamics
