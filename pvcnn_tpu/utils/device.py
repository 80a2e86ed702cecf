"""Device selection: `--devices 0,1-3` picks a subset of the visible accelerators.

The reference restricts visibility via CUDA_VISIBLE_DEVICES before torch imports
(reference: utils/device.py:6-21, train.py:12-21). JAX needs no env-var dance:
we parse the same spec grammar and build the data-parallel mesh over exactly the
listed devices. `cpu` entries force the CPU backend (reference treats `cpu` as
"no GPUs").
"""

from __future__ import annotations

__all__ = ["parse_device_spec", "select_devices"]


def parse_device_spec(spec: str):
    """'0,2-3' -> [0, 2, 3]; 'cpu' -> []. Accepts 'gpu0'/'tpu0' prefixes for
    familiarity with the reference grammar (utils/device.py:10-18)."""
    ids: list[int] = []
    for dev in spec.split(","):
        dev = dev.strip().lower()
        if not dev or dev == "cpu":
            continue
        for prefix in ("gpu", "tpu"):
            if dev.startswith(prefix):
                dev = dev[len(prefix):]
        if "-" in dev:
            lo, hi = map(int, dev.split("-"))
            ids.extend(range(lo, hi + 1))
        else:
            ids.append(int(dev))
    return ids


def select_devices(spec: str | None):
    """Resolve a --devices spec to a list of jax devices (or None = all).

    'cpu' switches the platform to CPU and returns None (all CPU devices);
    an index spec returns that subset of jax.devices(), validated in range.
    """
    if spec is None:
        return None
    import jax

    if spec.strip().lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
        return None
    ids = parse_device_spec(spec)
    if not ids:
        return None
    devices = jax.devices()
    bad = [i for i in ids if i < 0 or i >= len(devices)]
    if bad:
        raise ValueError(
            f"--devices {spec!r}: indices {bad} out of range for "
            f"{len(devices)} visible device(s)")
    return [devices[i] for i in ids]
