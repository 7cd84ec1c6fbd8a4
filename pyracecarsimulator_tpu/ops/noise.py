"""Scan post-processing: Gaussian range noise + clamp (reference noise
model, SURVEY.md §3.3 last line: ``ranges[i] = total + N(0, scan_std_dev)``).

Pure JAX; the key is threaded explicitly so rollouts stay deterministic
(same seed -> same trajectory, SURVEY.md §4 item 5)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def add_scan_noise(ranges, key, std_dev, max_range=None):
    """Add N(0, std) per beam, UNCLAMPED by default — the reference adds
    noise after the range clamp, so noisy returns may exceed max_range or
    dip below zero (oracle/raycast.py matches). Pass ``max_range`` to
    opt into re-clamping for consumers that need bounded ranges.

    ``std_dev == 0`` short-circuits to the input (noiseless parity mode).
    """
    if (isinstance(std_dev, (int, float)) and std_dev == 0.0) or key is None:
        return ranges
    noisy = ranges + std_dev * jax.random.normal(key, jnp.shape(ranges),
                                                 dtype=ranges.dtype)
    if max_range is not None:
        noisy = jnp.clip(noisy, 0.0, max_range)
    return noisy
