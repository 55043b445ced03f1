"""``dask.array.fft``-shaped namespace (reference: dask/array/fft.py
— fft_wrap over the numpy transforms, fftfreq/rfftfreq creation,
fftshift/ifftshift).

dask requires the FFT axis to be single-chunk; in this layout the
inner (in-row) axis ALWAYS is, so every 1-D transform is
embarrassingly parallel: one Arrow batch -> one vectorized
``np.fft.*(X, axis=1)`` per partition, map-only, no shuffle. Spark
has no complex type, so complex values travel as paired ``re``/``im``
array columns on one frame (the same convention as ``DArray.fft``).

``fftfreq``/``rfftfreq`` are pure JVM closed-form expressions over
``spark.range`` (no numpy at run time); ``fftshift``/``ifftshift``
on an NDArray are plan-time gather permutations — zero runtime cost
until a consumer materializes."""

from __future__ import annotations

import pyspark.sql.functions as F

from dask_spark.frame import DaskFrame


def _complex_transform(np_name: str, real_in: bool, real_out: bool):
    """Build a transform function: DArray (real) or (frame, re, im)
    complex input -> (id, re, im) frame (or (id, values) when the
    output is real)."""

    def run_transform(x, re: str = "re", im: str = "im", n: int | None = None):
        import numpy as np
        import pandas as pd

        if hasattr(x, "_col"):  # DArray: real input (numpy accepts
            # real input for every transform, so no gate needed)
            sdf = x._sdf
            idc, col = x._id, x._col
            if idc is None:
                raise ValueError(f"{np_name} requires id_col (row identity)")
            id_type = dict(sdf.dtypes)[idc]

            def run(it):
                fn = getattr(np.fft, np_name)
                for pdf in it:
                    if not len(pdf):
                        continue
                    X = np.array(pdf[col].tolist(), dtype="float64")
                    C = fn(X, n=n, axis=1) if n is not None else fn(X, axis=1)
                    if real_out:
                        yield pd.DataFrame(
                            {idc: pdf[idc], "values": list(C.real)}
                        )
                    else:
                        yield pd.DataFrame({
                            idc: pdf[idc],
                            "re": list(np.ascontiguousarray(C.real)),
                            "im": list(np.ascontiguousarray(C.imag)),
                        })

            schema = (
                f"{idc} {id_type}, values array<double>"
                if real_out
                else f"{idc} {id_type}, re array<double>, im array<double>"
            )
            return DaskFrame(sdf.select(idc, col).mapInPandas(run, schema))

        # complex input: a frame carrying re/im columns
        frame = x
        sdf = frame._sdf
        idc = [c for c in sdf.columns if c not in (re, im)][0]
        id_type = dict(sdf.dtypes)[idc]

        def run(it):
            fn = getattr(np.fft, np_name)
            for pdf in it:
                if not len(pdf):
                    continue
                C = (
                    np.array(pdf[re].tolist(), dtype="float64")
                    + 1j * np.array(pdf[im].tolist(), dtype="float64")
                )
                O = fn(C, n=n, axis=1) if n is not None else fn(C, axis=1)
                if real_out:
                    yield pd.DataFrame({idc: pdf[idc], "values": list(O.real)})
                else:
                    yield pd.DataFrame({
                        idc: pdf[idc],
                        "re": list(np.ascontiguousarray(O.real)),
                        "im": list(np.ascontiguousarray(O.imag)),
                    })

        schema = (
            f"{idc} {id_type}, values array<double>"
            if real_out
            else f"{idc} {id_type}, re array<double>, im array<double>"
        )
        return DaskFrame(sdf.mapInPandas(run, schema))

    run_transform.__name__ = np_name
    run_transform.__doc__ = (
        f"np.fft.{np_name} along the in-row axis (reference "
        f"dask/array/fft.py {np_name} via fft_wrap) — one vectorized "
        f"numpy call per Arrow batch, map-only."
    )
    return run_transform


fft = _complex_transform("fft", real_in=True, real_out=False)
ifft = _complex_transform("ifft", real_in=False, real_out=False)
rfft = _complex_transform("rfft", real_in=True, real_out=False)
irfft = _complex_transform("irfft", real_in=False, real_out=True)
hfft = _complex_transform("hfft", real_in=False, real_out=True)
ihfft = _complex_transform("ihfft", real_in=True, real_out=False)


def fft_wrap(fft_func, kind: str | None = None, dtype=None):
    """reference dask/array/fft.py:118 fft_wrap — wrap ANY
    numpy-fft-shaped callable (scipy.fft.*, a custom transform) as an
    in-row transform. The callable itself ships to the executors;
    only the re/im framing is shared with the named transforms."""
    import numpy as np
    import pandas as pd

    name = kind or getattr(fft_func, "__name__", "fft")
    real_out = name in ("irfft", "hfft")

    def run_transform(x, re: str = "re", im: str = "im",
                      n: int | None = None):
        if hasattr(x, "_col"):
            sdf, idc, col = x._sdf, x._id, x._col
            if idc is None:
                raise ValueError(f"{name} requires id_col (row identity)")
        else:
            sdf = x._sdf
            idc = [c for c in sdf.columns if c not in (re, im)][0]
            col = None
        id_type = dict(sdf.dtypes)[idc]

        def run(it):
            for pdf in it:
                if not len(pdf):
                    continue
                if col is not None:
                    X = np.array(pdf[col].tolist(), dtype="float64")
                else:
                    X = (
                        np.array(pdf[re].tolist(), dtype="float64")
                        + 1j * np.array(pdf[im].tolist(), dtype="float64")
                    )
                C = (fft_func(X, n=n, axis=1) if n is not None
                     else fft_func(X, axis=1))
                C = np.asarray(C)
                if real_out or not np.iscomplexobj(C):
                    yield pd.DataFrame({idc: pdf[idc],
                                        "values": list(C.real)})
                else:
                    yield pd.DataFrame({
                        idc: pdf[idc],
                        "re": list(np.ascontiguousarray(C.real)),
                        "im": list(np.ascontiguousarray(C.imag)),
                    })

        # probe the output kind on a tiny input so the schema is fixed
        pout = np.asarray(fft_func(np.zeros((1, 4)), axis=1))
        complex_out = np.iscomplexobj(pout) and not real_out
        schema = (
            f"{idc} {id_type}, re array<double>, im array<double>"
            if complex_out
            else f"{idc} {id_type}, values array<double>"
        )
        src = sdf if col is None else sdf.select(idc, col)
        return DaskFrame(src.mapInPandas(run, schema))

    run_transform.__name__ = name
    return run_transform


def fftfreq(n: int, d: float = 1.0, npartitions: int | None = None):
    """reference fft.py:262 fftfreq — sample frequencies as a
    distributed (n,) column: pure closed-form JVM arithmetic over
    spark.range, no numpy at run time."""
    from dask_spark.session import get_spark

    spark = get_spark()
    rng = spark.range(
        0, n, 1, npartitions or spark.sparkContext.defaultParallelism
    )
    i = F.col("id")
    val = F.when(
        i < (n + 1) // 2, i.cast("double") / (n * d)
    ).otherwise((i.cast("double") - n) / (n * d))
    return DaskFrame(rng.select(i.alias("row_id"), val.alias("freq")))


def rfftfreq(n: int, d: float = 1.0, npartitions: int | None = None):
    """reference fft.py:272 rfftfreq — the non-negative half."""
    from dask_spark.session import get_spark

    spark = get_spark()
    m = n // 2 + 1
    rng = spark.range(
        0, m, 1, npartitions or spark.sparkContext.defaultParallelism
    )
    i = F.col("id")
    return DaskFrame(
        rng.select(i.alias("row_id"), (i.cast("double") / (n * d)).alias("freq"))
    )


def fftshift(x, axes=None):
    """reference fft.py:310 fftshift over INNER axes — a plan-time
    gather permutation (numpy plans the roll on the index tensor)."""
    import numpy as np

    if not hasattr(x, "inner_shape"):
        raise TypeError("fftshift needs an NDArray (inner axes)")
    ax = (
        tuple(range(1, len(x.inner_shape) + 1)) if axes is None
        else ((axes,) if isinstance(axes, int) else tuple(axes))
    )
    if 0 in ax:
        raise ValueError("cannot shift the distributed row axis")
    t = np.fft.fftshift(x._index_tensor(), axes=[a - 1 for a in ax])
    return x._gather(t.ravel(), x.inner_shape)


def ifftshift(x, axes=None):
    import numpy as np

    if not hasattr(x, "inner_shape"):
        raise TypeError("ifftshift needs an NDArray (inner axes)")
    ax = (
        tuple(range(1, len(x.inner_shape) + 1)) if axes is None
        else ((axes,) if isinstance(axes, int) else tuple(axes))
    )
    if 0 in ax:
        raise ValueError("cannot shift the distributed row axis")
    t = np.fft.ifftshift(x._index_tensor(), axes=[a - 1 for a in ax])
    return x._gather(t.ravel(), x.inner_shape)
