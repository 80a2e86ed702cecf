"""Executable-Python config system.

Keeps the reference's UX (reference: utils/config.py) — python config files that
layer mutations onto a global `configs` singleton by package-path chaining, dotted
CLI overrides, and late-binding factory nodes — with a cleaner instantiation story:
a `Config` node holds a factory plus keyword children and builds the object tree
recursively when called. Config *files* are executed (not imported as modules), so
the configs/ tree needs no sys.path tricks.

Usage:
    configs.update_from_file('configs/shapenet/pvcnn/c0p25.py')
    configs.update_from_arguments('--configs.train.num_epochs=1')
    model = configs.model()           # instantiates the factory tree
"""

from __future__ import annotations

import os
from typing import Any

__all__ = ["Config", "configs"]


class AttrDict(dict):
    def __getattr__(self, k):
        if k not in self:
            raise AttributeError(k)
        return self[k]

    def __setattr__(self, k, v):
        self[k] = v

    def __delattr__(self, k):
        del self[k]


class Config(AttrDict):
    """A dict node that can also act as a late-binding factory.

    `Config(fn, key=value, ...)` stores `fn`; calling the node instantiates it with
    its children as keyword arguments (children that are themselves non-detached
    Config factories are instantiated first, recursively). `detach=True` passes the
    child Config through un-instantiated — used for sub-configs consumed lazily.
    """

    def __init__(self, _func_=None, _detach_: bool = False, **kwargs):
        super().__init__(**kwargs)
        if _func_ is not None and not callable(_func_):
            raise TypeError(f"func {_func_!r} is not callable")
        object.__setattr__(self, "_func_", None)
        object.__setattr__(self, "_detach_", False)
        self.__dict__["_func_"] = _func_
        self.__dict__["_detach_"] = _detach_

    @property
    def func(self):
        return self.__dict__.get("_func_")

    @property
    def detached(self):
        return self.__dict__.get("_detach_", False)

    def __call__(self, *args, **kwargs):
        if self.func is None:
            return self
        built = {k: _build(v) for k, v in self.items()}
        built.update(kwargs)
        return self.func(*args, **built)

    # ---- file / CLI loading -------------------------------------------------

    def update_from_file(self, path: str):
        """Execute `path` plus every __init__.py on its directory chain (each file
        once), mirroring the reference's package-import chaining
        (utils/config.py:109-113 + configs/** __init__ semantics)."""
        executed = set()

        def exec_once(p):
            p = os.path.normpath(p)
            if p in executed or not os.path.exists(p):
                return
            executed.add(p)
            with open(p) as f:
                code = compile(f.read(), p, "exec")
            exec(code, {"__file__": p, "__name__": "__config__"})

        path = os.path.normpath(path)
        parts = path.split(os.sep)
        for i in range(1, len(parts)):
            prefix = os.sep.join(parts[:i])  # preserves a leading '/'
            if prefix:
                exec_once(os.path.join(prefix, "__init__.py"))
        exec_once(path)

    def update_from_modules(self, *paths: str):
        for p in paths:
            self.update_from_file(p)

    def update_from_arguments(self, *args: str):
        index = 0
        args = list(args)
        while index < len(args):
            arg = args[index]
            if not arg.startswith("--configs."):
                raise ValueError(f'unrecognized argument "{arg}"')
            arg = arg[len("--configs."):]
            if "=" in arg:
                dotted, val = arg.split("=", 1)
                index += 1
            else:
                dotted, val = arg, args[index + 1]
                index += 2
            node = self
            keys = dotted.split(".")
            for k in keys[:-1]:
                if k not in node or not isinstance(node[k], Config):
                    node[k] = Config()
                node = node[k]
            node[keys[-1]] = _parse_value(val)

    # ---- display ------------------------------------------------------------

    def __str__(self, indent: int = 0) -> str:
        lines = []
        if self.func is not None:
            lines.append(" " * indent + f"[func] = {self.func}")
        for k, v in self.items():
            if isinstance(v, Config):
                lines.append(" " * indent + f"[{k}]")
                sub = v.__str__(indent + 2)
                if sub:
                    lines.append(sub)
            else:
                lines.append(" " * indent + f"[{k}] = {v}")
        return "\n".join(lines)


def _build(v: Any):
    if isinstance(v, Config):
        return v if v.detached else v()
    if isinstance(v, (list, tuple)):
        return type(v)(_build(x) for x in v)
    return v


def _parse_value(x: str):
    if len(x) >= 2 and x[0] == x[-1] and x[0] in "'\"":
        return x[1:-1]
    try:
        return eval(x, {}, {})  # literals, tuples, arithmetic
    except Exception:
        return x


configs = Config()
