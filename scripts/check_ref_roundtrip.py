#!/usr/bin/env python3
"""Cross-implementation interop check: load an archive EXPORTED BY THIS
ENGINE (SignalIO.saveReferenceZip) with the ACTUAL reference package's
Dataset.load. Proves a reference user can move data in both directions.

Usage: python3 scripts/check_ref_roundtrip.py <zip> <dataset_name>
(The IOSpec test writes /tmp/graft_ref_export.zip with name "fixture".)
"""
import sys, types


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


def main(zip_path, name):
    stub_plotly()
    sys.path.insert(0, "/root/reference/src")
    from meteaudata.types import Dataset
    ds = Dataset.load(zip_path, name)
    print(f"loaded dataset: {ds.name!r}, signals: {list(ds.signals)}")
    total = 0
    for sname, sig in ds.signals.items():
        for ts_name, ts in sig.time_series.items():
            n = len(ts.series)
            total += n
            print(f"  {ts_name}: {n} rows, dtype={ts.series.dtype}, "
                  f"steps={[s.function_info.name for s in ts.processing_steps]}")
    assert total > 0, "no data rows came back"
    print(f"OK: reference loaded {total} rows from the engine's export")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
