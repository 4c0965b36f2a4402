"""DispatchStats anomaly accounting (round 5).

The r5 integrated step-2 rerun hit a degraded-tunnel window: three
dispatches of an already-compiled executable took ~453 s each vs its
own 12.8 s first dispatch (BENCH_NOTES round 5).  DispatchStats must
flag such dispatches, exclude their excess from the steady estimate,
and report it as ``anomaly_s`` so feasibility math never scales
chip-health wall as if it were steady-state.
"""

from ospo_tpu.utils.profiling import DispatchStats


def test_steady_dispatches_unaffected():
    st = DispatchStats()
    st.record("sig", 20.0)          # first carries compile
    for _ in range(3):
        st.record("sig", 10.0)
    s = st.summary()
    assert "anomaly_s" not in s
    sig = s["signatures"]["sig"]
    assert "anomalies" not in sig
    assert sig["steady_mean_s"] == 10.0
    # compile = first - steady_mean; steady = 3*10 + one exec at 10
    assert s["compile_s_est"] == 10.0
    assert s["steady_s"] == 40.0


def test_anomalous_dispatch_excess_is_split_out(capsys):
    st = DispatchStats()
    st.record("sig", 12.8)
    st.record("sig", 12.0)
    st.record("sig", 453.0)         # >4x first and > first+5s
    s = st.summary()
    sig = s["signatures"]["sig"]
    assert sig["anomalies"] == 1
    assert abs(sig["anomaly_s"] - (453.0 - 12.8)) < 0.11
    assert abs(s["anomaly_s"] - (453.0 - 12.8)) < 0.11
    # steady mean computed from CLEAN dispatches only
    assert sig["steady_mean_s"] == 12.0
    # the anomalous dispatch is billed at first-dispatch cost, not 453 s
    assert s["steady_s"] < 40.0
    # compile + steady + anomaly reconciles to total recorded wall
    total = 12.8 + 12.0 + 453.0
    assert abs(s["compile_s_est"] + s["steady_s"] + s["anomaly_s"]
               - total) < 0.2
    assert "DISPATCH ANOMALY" in capsys.readouterr().out


def test_small_jitter_not_flagged():
    st = DispatchStats()
    st.record("sig", 0.5)
    st.record("sig", 2.1)           # >4x first but under the 5 s floor
    assert "anomaly_s" not in st.summary()


def test_all_rest_anomalous_still_reconciles():
    st = DispatchStats()
    st.record("sig", 10.0)
    st.record("sig", 100.0)
    st.record("sig", 90.0)
    s = st.summary()
    assert s["signatures"]["sig"]["anomalies"] == 2
    total = 10.0 + 100.0 + 90.0
    assert abs(s["compile_s_est"] + s["steady_s"] + s["anomaly_s"]
               - total) < 0.2
