"""Observability helpers."""

import numpy as np

from image_retrieval_tpu.utils.profiling import Throughput, StageTimes, trace


def test_trace_and_stage_times():
    st = StageTimes()
    with st.stage("embed"):
        x = np.ones((100, 100)) @ np.ones((100, 100))
    with st.stage("search"):
        pass
    with trace("standalone"):
        pass
    s = st.summary()
    assert set(s.keys()) == {"embed", "search"}
    assert s["embed"] >= 0


def test_throughput_counter():
    t = Throughput("ingest")
    t.add(100)
    t.add(50)
    assert t.items == 150
    assert t.per_sec > 0
    t.log()
