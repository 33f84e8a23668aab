#!/usr/bin/env python3
"""Regenerate the round-4 interop fixtures by running the ACTUAL reference
implementation's Signal.save (/root/reference): weekly-period labels,
sub-second (µs) datetime labels, and quoted string values — the three
label/value grammars the r3 io layer mishandled. Usage:

    python3 scripts/make_ref_fixture_extra.py /tmp/ref_fixture_extra
    cp /tmp/ref_fixture_extra/*.zip src/test/resources/
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
    from meteaudata.types import Signal, DataProvenance
    import pandas as pd
    import numpy as np

    os.makedirs(out_dir, exist_ok=True)
    prov = DataProvenance(source_repository="graft tests", project="interop",
                          location="lab", equipment="sensor-1",
                          parameter="COD", purpose="fixture",
                          metadata_id="42")

    # weekly PeriodIndex: pandas writes '2023-12-25/2023-12-31' range labels
    widx = pd.period_range("2024-01-01", periods=6, freq="W")
    wser = pd.Series(np.arange(1.0, 7.0), index=widx, name="RAW")
    wsig = Signal(input_data=wser, name="WK", units="kg", provenance=prov)
    wsig.save(out_dir)
    os.rename(os.path.join(out_dir, "WK#1.zip"),
              os.path.join(out_dir, "interop_signal_weekly.zip"))

    # sub-second DatetimeIndex: µs fractions must survive the CSV labels
    sidx = pd.to_datetime(["2024-01-01 00:00:00.250000",
                           "2024-01-01 00:00:00.500000",
                           "2024-01-01 00:00:00.750123",
                           "2024-01-01 00:00:01.000000"])
    sser = pd.Series([1.0, 2.0, 3.0, 4.0], index=sidx, name="RAW")
    ssig = Signal(input_data=sser, name="SS", units="mg/l", provenance=prov)
    ssig.save(out_dir)
    os.rename(os.path.join(out_dir, "SS#1.zip"),
              os.path.join(out_dir, "interop_signal_subsec.zip"))

    # string values with embedded commas/quotes/newlines (pandas quotes them)
    qidx = pd.date_range("2024-01-01", periods=3, freq="1h")
    qser = pd.Series(['plain', 'a,b "quoted"', 'line1\nline2'],
                     index=qidx, name="RAW")
    qsig = Signal(input_data=qser, name="QT", units="state", provenance=prov)
    qsig.save(out_dir)
    os.rename(os.path.join(out_dir, "QT#1.zip"),
              os.path.join(out_dir, "interop_signal_quoted.zip"))

    print("wrote fixtures to", out_dir)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/ref_fixture_extra")
