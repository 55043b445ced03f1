"""``dask.utils``-shaped helpers (reference: dask/utils.py and
dask/base.py tokenize / dask/sizeof.py — the utility surface dask
users call directly: parse_bytes/format_bytes, parse_timedelta,
format_time, tokenize, Dispatch, natural_sort_key, the is_*_like
probes, tmpfile/tmpdir). Implementations are original, written to the
documented dask semantics; collection probes understand this engine's
frame/array classes as well as pandas/numpy."""

from __future__ import annotations

import contextlib
import hashlib
import math
import os
import pickle
import re
import shutil
import sys
import tempfile
import threading
import uuid
from typing import Any, Callable, Iterable

# ---- function helpers --------------------------------------------------


def apply(func, args, kwargs=None):
    """reference utils.py apply — the call-shape used inside graphs."""
    return func(*args, **(kwargs or {}))


def deepmap(func, *seqs):
    """reference utils.py deepmap — map over arbitrarily nested
    lists."""
    if isinstance(seqs[0], (list, Iterable)) and not isinstance(
        seqs[0], (str, bytes)
    ):
        return [deepmap(func, *items) for items in zip(*seqs)]
    return func(*seqs)


def ndeepmap(n: int, func, seq):
    """reference utils.py ndeepmap — map at an exact nesting depth."""
    if n <= 0:
        return func(seq)
    if n == 1:
        return [func(item) for item in seq]
    return [ndeepmap(n - 1, func, item) for item in seq]


def import_required(mod_name: str, error_msg: str):
    """reference utils.py import_required."""
    try:
        return __import__(mod_name, fromlist=["__name__"])
    except ImportError as e:
        raise RuntimeError(error_msg) from e


def funcname(func) -> str:
    """reference utils.py funcname — a short human name for a
    callable."""
    while hasattr(func, "func"):  # functools.partial chains
        func = func.func
    name = getattr(func, "__name__", None)
    if name is None:
        return str(func)[:50]
    return name[:50]


def typename(typ, short: bool = False) -> str:
    """reference utils.py typename."""
    if not isinstance(typ, type):
        typ = type(typ)
    mod = getattr(typ, "__module__", "") or ""
    name = f"{mod}.{typ.__qualname__}" if mod not in ("builtins", "") else typ.__qualname__
    if short:
        name = name.replace("dask_spark.", "ds.")
    return name


class Dispatch:
    """reference utils.py Dispatch — single-dispatch registry by
    type, walking the MRO on lookup."""

    def __init__(self, name: str | None = None):
        self._lookup: dict[type, Callable] = {}
        self.__name__ = name or "dispatch"

    def register(self, type_, func=None):
        def wrapper(fn):
            for t in type_ if isinstance(type_, tuple) else (type_,):
                self._lookup[t] = fn
            return fn

        return wrapper(func) if func is not None else wrapper

    def dispatch(self, cls: type) -> Callable:
        for t in cls.__mro__:
            if t in self._lookup:
                return self._lookup[t]
        raise TypeError(f"No dispatch for {cls}")

    def __call__(self, arg, *args, **kwargs):
        return self.dispatch(type(arg))(arg, *args, **kwargs)


class methodcaller:
    """reference utils.py methodcaller — picklable operator
    .methodcaller."""

    def __init__(self, method: str):
        self.method = method

    def __call__(self, obj, *args, **kwargs):
        return getattr(obj, self.method)(*args, **kwargs)

    def __reduce__(self):
        return (methodcaller, (self.method,))


class itemgetter:
    """reference utils.py itemgetter — picklable single-key getter."""

    def __init__(self, index):
        self.index = index

    def __call__(self, obj):
        return obj[self.index]

    def __reduce__(self):
        return (itemgetter, (self.index,))


class IndexCallable:
    """reference utils.py IndexCallable — ``obj[key]`` calls fn."""

    def __init__(self, fn):
        self.fn = fn

    def __getitem__(self, key):
        return self.fn(key)


class SerializableLock:
    """reference utils.py SerializableLock — a lock that pickles by
    token and re-associates with the same underlying lock in-process."""

    _locks: dict[str, threading.Lock] = {}

    def __init__(self, token: str | None = None):
        self.token = token or str(uuid.uuid4())
        self.lock = self._locks.setdefault(self.token, threading.Lock())

    def acquire(self, *args, **kwargs):
        return self.lock.acquire(*args, **kwargs)

    def release(self):
        return self.lock.release()

    def __enter__(self):
        self.lock.acquire()
        return self

    def __exit__(self, *exc):
        self.lock.release()

    def locked(self):
        return self.lock.locked()

    def __reduce__(self):
        return (SerializableLock, (self.token,))


# ---- tmp helpers -------------------------------------------------------


@contextlib.contextmanager
def tmpfile(extension: str = "", dir=None):
    """reference utils.py tmpfile — yields a path, cleans up after."""
    extension = "." + extension.lstrip(".") if extension else ""
    handle, path = tempfile.mkstemp(extension, dir=dir)
    os.close(handle)
    os.remove(path)
    try:
        yield path
    finally:
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        elif os.path.exists(path):
            os.remove(path)


@contextlib.contextmanager
def tmpdir(dir=None):
    path = tempfile.mkdtemp(dir=dir)
    try:
        yield path
    finally:
        shutil.rmtree(path, ignore_errors=True)


@contextlib.contextmanager
def filetext(text: str, extension: str = "", open=open, mode: str = "w"):
    with tmpfile(extension=extension) as filename:
        with open(filename, mode) as fh:
            fh.write(text)
        yield filename


# ---- predicates --------------------------------------------------------


def is_integer(i) -> bool:
    return isinstance(i, int) or (
        hasattr(i, "is_integer") and callable(i.is_integer) and i.is_integer()
    )


def is_arraylike(x) -> bool:
    """numpy-like OR this engine's DArray/NDArray."""
    if hasattr(x, "_col") and hasattr(x, "map"):
        return True
    return (
        hasattr(x, "shape") and hasattr(x, "dtype") and hasattr(x, "ndim")
    )


def is_dataframe_like(df) -> bool:
    if hasattr(df, "_sdf") and hasattr(df, "compute"):
        return True
    return hasattr(df, "dtypes") and hasattr(df, "columns") and hasattr(
        df, "groupby"
    )


def is_series_like(s) -> bool:
    if hasattr(s, "_expr") and hasattr(s, "_frame"):
        return True
    return hasattr(s, "dtype") and hasattr(s, "index") and not hasattr(
        s, "columns"
    )


def is_index_like(s) -> bool:
    return hasattr(s, "dtype") and hasattr(s, "name") and not hasattr(
        s, "index"
    ) and not hasattr(s, "columns")


def ensure_dict(d, *, copy: bool = False) -> dict:
    if type(d) is dict:
        return d.copy() if copy else d
    return dict(d)


def ensure_set(s, *, copy: bool = False) -> set:
    if type(s) is set:
        return s.copy() if copy else s
    return set(s)


def ensure_bytes(s) -> bytes:
    if isinstance(s, bytes):
        return s
    if isinstance(s, str):
        return s.encode("utf-8")
    if hasattr(s, "tobytes"):
        return s.tobytes()
    return bytes(s)


def ensure_unicode(s) -> str:
    if isinstance(s, str):
        return s
    if isinstance(s, (bytes, bytearray)):
        return bytes(s).decode("utf-8")
    return str(s)


def concrete(seq):
    """reference utils.py concrete — nested iterators -> nested
    lists."""
    if isinstance(seq, Iterable) and not isinstance(seq, (str, bytes)):
        return [concrete(x) for x in seq]
    return seq


# ---- parsing / formatting ----------------------------------------------

_BYTE_SIZES = {
    "": 1, "b": 1,
    "k": 1000, "kb": 1000, "m": 1000**2, "mb": 1000**2,
    "g": 1000**3, "gb": 1000**3, "t": 1000**4, "tb": 1000**4,
    "p": 1000**5, "pb": 1000**5,
    "ki": 1024, "kib": 1024, "mi": 1024**2, "mib": 1024**2,
    "gi": 1024**3, "gib": 1024**3, "ti": 1024**4, "tib": 1024**4,
    "pi": 1024**5, "pib": 1024**5,
}


def parse_bytes(s) -> int:
    """reference utils.py parse_bytes: '128MB' -> 128000000,
    '128 MiB' -> 134217728, 123 -> 123."""
    if isinstance(s, (int, float)):
        return int(s)
    m = re.fullmatch(r"\s*([0-9.eE+-]+)\s*([A-Za-z]*)\s*", s)
    if not m:
        raise ValueError(f"Could not interpret {s!r} as a byte count")
    num, unit = m.groups()
    mult = _BYTE_SIZES.get(unit.lower())
    if mult is None:
        raise ValueError(f"Could not interpret unit {unit!r}")
    return int(float(num) * mult)


def format_bytes(n: int) -> str:
    """reference utils.py format_bytes: binary units, two decimals —
    format_bytes(1234567) == '1.18 MiB'."""
    for prefix, k in (
        ("Pi", 2**50), ("Ti", 2**40), ("Gi", 2**30), ("Mi", 2**20),
        ("ki", 2**10),
    ):
        if abs(n) >= k * 0.9:
            return f"{n / k:.2f} {prefix}B"
    return f"{n} B"


def memory_repr(num) -> str:
    """reference utils.py memory_repr (legacy decimal form)."""
    for unit in ("bytes", "KB", "MB", "GB", "TB"):
        if abs(num) < 1024.0:
            return f"{num:3.1f} {unit}"
        num /= 1024.0
    return f"{num:3.1f} PB"


_TIME_SIZES = {
    "us": 1e-6, "ms": 1e-3, "s": 1, "sec": 1, "second": 1, "seconds": 1,
    "m": 60, "min": 60, "minute": 60, "minutes": 60,
    "h": 3600, "hr": 3600, "hour": 3600, "hours": 3600,
    "d": 86400, "day": 86400, "days": 86400,
    "w": 604800, "week": 604800, "weeks": 604800,
}


def parse_timedelta(s, default: str = "seconds"):
    """reference utils.py parse_timedelta: '3s' -> 3, '3.5 seconds'
    -> 3.5, '300ms' -> 0.3, 5 -> 5 (in ``default`` units); returns
    seconds."""
    if s is None:
        return None
    if isinstance(s, (int, float)):
        return s * _TIME_SIZES[default] / _TIME_SIZES["s"] if default != "seconds" else s
    import datetime

    if isinstance(s, datetime.timedelta):
        return s.total_seconds()
    m = re.fullmatch(r"\s*([0-9.eE+-]+)\s*([A-Za-z]*)\s*", s)
    if not m:
        raise ValueError(f"Could not interpret {s!r} as a duration")
    num, unit = m.groups()
    mult = _TIME_SIZES.get(unit.lower() or default)
    if mult is None:
        raise ValueError(f"Could not interpret unit {unit!r}")
    out = float(num) * mult
    return int(out) if out == int(out) else out


def format_time(n: float) -> str:
    """reference utils.py format_time: '1.23 s', '123.45 ms',
    '12.34 us', hours/minutes for long spans."""
    if n >= 3600:
        h, rem = divmod(n, 3600)
        m, _ = divmod(rem, 60)
        return f"{int(h)}hr {int(m)}min"
    if n >= 120:
        m, s = divmod(n, 60)
        return f"{int(m)}min {int(s)}s"
    if n >= 1:
        return f"{n:.2f} s"
    if n >= 1e-3:
        return f"{n * 1e3:.2f} ms"
    return f"{n * 1e6:.2f} us"


def natural_sort_key(s: str):
    """reference utils.py natural_sort_key — 'f10' sorts after
    'f2'."""
    return [
        int(part) if part.isdigit() else part
        for part in re.split(r"(\d+)", s)
    ]


def digit(n: int, k: int, base: int) -> int:
    """reference utils.py digit — k-th digit of n in ``base``."""
    return n // base**k % base


def insert(tup: tuple, loc: int, val) -> tuple:
    """reference utils.py insert — functional tuple replace."""
    lst = list(tup)
    lst[loc] = val
    return tuple(lst)


def asciitable(columns, rows) -> str:
    """reference utils.py asciitable."""
    widths = [
        max(len(str(c)), *(len(str(r[i])) for r in rows)) if rows else len(str(c))
        for i, c in enumerate(columns)
    ]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    def line(vals):
        return "| " + " | ".join(str(v).ljust(w) for v, w in zip(vals, widths)) + " |"
    out = [sep, line(columns), sep]
    out += [line(r) for r in rows]
    out.append(sep)
    return "\n".join(out)


def pseudorandom(n: int, p, random_state=None):
    """reference utils.py pseudorandom — n draws from a categorical
    distribution."""
    import numpy as np

    rng = np.random.RandomState(random_state)
    cp = np.cumsum([0] + list(p))
    x = rng.random_sample(n)
    return np.searchsorted(cp, x) - 1


def random_state_data(n: int, random_state=None) -> list:
    """reference utils.py random_state_data — n independent child
    seeds derived from one state."""
    import numpy as np

    rng = (
        random_state
        if isinstance(random_state, np.random.RandomState)
        else np.random.RandomState(random_state)
    )
    return [
        rng.randint(0, 2**31, size=624, dtype="uint32") for _ in range(n)
    ]


# ---- tokenize (reference dask/base.py tokenize) ------------------------


def _normalize(x) -> bytes:
    import numpy as np

    if isinstance(x, (int, float, bool, str, bytes, type(None))):
        return repr(x).encode()
    if isinstance(x, (list, tuple)):
        return b"(" + b",".join(_normalize(i) for i in x) + b")"
    if isinstance(x, dict):
        return b"{" + b",".join(
            _normalize(k) + b":" + _normalize(v)
            for k, v in sorted(x.items(), key=lambda kv: repr(kv[0]))
        ) + b"}"
    if isinstance(x, set):
        return b"s{" + b",".join(sorted(_normalize(i) for i in x)) + b"}"
    if isinstance(x, np.ndarray):
        return x.tobytes() + repr((x.dtype, x.shape)).encode()
    try:
        import pandas as pd

        if isinstance(x, (pd.Series, pd.DataFrame, pd.Index)):
            from pandas.util import hash_pandas_object

            return hash_pandas_object(x, index=True).values.tobytes()
    except ImportError:  # pragma: no cover
        pass
    if hasattr(x, "_sdf"):  # this engine's lazy collections
        try:
            # analyzed, not logical: an unresolved read prints without
            # its path, making every fresh scan token-equal
            plan = x._sdf._jdf.queryExecution().analyzed().toString()
        except Exception:
            plan = str(x._sdf.schema)
        return plan.encode()
    if callable(x):
        return (
            f"{getattr(x, '__module__', '')}."
            f"{getattr(x, '__qualname__', funcname(x))}"
        ).encode()
    try:
        return pickle.dumps(x, protocol=4)
    except Exception:
        return str(uuid.uuid4()).encode()  # non-deterministic fallback


def tokenize(*args, **kwargs) -> str:
    """Deterministic content hash (reference dask/base.py tokenize):
    equal inputs give equal tokens across calls; lazy collections
    hash their logical plan."""
    h = hashlib.md5()
    for a in args:
        h.update(_normalize(a))
    for k in sorted(kwargs):
        h.update(k.encode())
        h.update(_normalize(kwargs[k]))
    return h.hexdigest()


# ---- sizeof (reference dask/sizeof.py) ---------------------------------

sizeof = Dispatch(name="sizeof")


@sizeof.register(object)
def _sizeof_default(o):
    return sys.getsizeof(o)


@sizeof.register((list, tuple, set, frozenset))
def _sizeof_seq(seq):
    return sys.getsizeof(seq) + sum(sizeof(i) for i in seq)


@sizeof.register(dict)
def _sizeof_dict(d):
    return sys.getsizeof(d) + sum(
        sizeof(k) + sizeof(v) for k, v in d.items()
    )


def _register_optional_sizeofs():
    try:
        import numpy as np

        @sizeof.register(np.ndarray)
        def _sizeof_numpy(x):
            return int(x.nbytes)
    except ImportError:  # pragma: no cover
        pass
    try:
        import pandas as pd

        @sizeof.register((pd.DataFrame, pd.Series))
        def _sizeof_pandas(x):
            mu = x.memory_usage(deep=True)
            return int(mu.sum() if hasattr(mu, "sum") else mu)
    except ImportError:  # pragma: no cover
        pass


_register_optional_sizeofs()
