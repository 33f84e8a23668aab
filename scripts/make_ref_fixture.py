#!/usr/bin/env python3
"""Regenerate src/test/resources/interop_ds.zip by running the ACTUAL
reference implementation's Dataset.save (/root/reference, YAML metadata +
per-series CSVs). plotly (visualization-only dependency) is stubbed out so
the package imports in this container. Usage:

    python3 scripts/make_ref_fixture.py /tmp/ref_fixture
    cp /tmp/ref_fixture/interop_ds.zip src/test/resources/

The IOSpec interop test asserts against this fixture's exact contents
(24 hourly points 1..24 in signal A, resampled to 2h by the reference's
own resample step).
"""
import sys, types, os


def stub_plotly():
    class _Anything:
        def __init__(self, *a, **k): pass
        def __call__(self, *a, **k): return _Anything()
        def __getattr__(self, n): return _Anything()
    for name in ["plotly", "plotly.graph_objects", "plotly.subplots",
                 "plotly.express", "plotly.io"]:
        m = types.ModuleType(name)
        m.__file__ = "/tmp/stub_plotly.py"
        m.__getattr__ = lambda n, _m=name: _Anything()
        sys.modules[name] = m


def main(out_dir):
    stub_plotly()
    sys.path.insert(0, "/root/reference/src")
    from meteaudata.types import Signal, Dataset, DataProvenance
    from meteaudata.processing_steps.univariate.resample import resample
    import pandas as pd
    import numpy as np

    idx = pd.date_range("2024-01-01", periods=24, freq="1h")
    ser = pd.Series(np.round(np.linspace(1.0, 24.0, 24), 2), index=idx,
                    name="RAW")
    prov = DataProvenance(source_repository="graft tests", project="interop",
                          location="lab", equipment="sensor-1",
                          parameter="COD", purpose="fixture",
                          metadata_id="42")
    sig = Signal(input_data=ser, name="A", units="mg/l", provenance=prov)
    sig.process(["A#1_RAW#1"], resample, "2h")
    ds = Dataset(name="interop_ds", description="reference-format fixture",
                 owner="graft", purpose="yaml interop test", project="graft",
                 signals={"A#1": sig})
    os.makedirs(out_dir, exist_ok=True)
    ds.save(out_dir)
    print("wrote", os.path.join(out_dir, "interop_ds.zip"))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/ref_fixture")
