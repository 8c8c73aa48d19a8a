"""I/O tests (parity model: ref unit_test_recorders.cpp incl. network
loopback, unit_test_serialization.cpp round-trips)."""
import os
import threading

import numpy as np
import pytest

import reak_tpu.io as io
from reak_tpu.io.recorder import MemoryRecorder, CsvRecorder, BinaryRecorder, NetworkServer, TcpRecorder


def test_memory_recorder():
    rec = MemoryRecorder(["t", "x"])
    rec.record([0.0, 1.0])
    rec.record({"t": 1.0, "x": 2.0})
    rec.close()
    np.testing.assert_allclose(rec.as_array(), [[0, 1], [1, 2]])


def test_row_width_check():
    rec = MemoryRecorder(["a", "b"])
    with pytest.raises(ValueError):
        rec.record([1.0])


def test_csv_roundtrip(tmp_path):
    p = str(tmp_path / "out.ssv")
    rec = CsvRecorder(p, ["time", "q"], buffered=True)
    for i in range(5):
        rec.record([i * 0.1, i * i])
    rec.close()
    cols, rows = io.open_extractor(p)
    assert cols == ["time", "q"]
    np.testing.assert_allclose(rows[:, 1], [0, 1, 4, 9, 16])


def test_binary_roundtrip(tmp_path):
    p = str(tmp_path / "out.bin")
    rec = BinaryRecorder(p, ["a", "b", "c"], buffered=False)
    rec.record([1.0, 2.0, 3.0])
    rec.record([4.0, 5.0, 6.0])
    rec.close()
    cols, rows = io.open_extractor(p)
    assert cols == ["a", "b", "c"]
    np.testing.assert_allclose(rows, [[1, 2, 3], [4, 5, 6]])


def test_tcp_loopback():
    """Network recorder loopback in-process (ref: unit_test_recorders.cpp
    network test)."""
    srv = NetworkServer(0)
    rows_out = []

    def serve():
        srv.accept()
        while True:
            r = srv.read_row()
            if r is None:
                break
            rows_out.append(r)

    th = threading.Thread(target=serve, daemon=True)
    th.start()
    rec = TcpRecorder("127.0.0.1", srv.port, ["t", "z"], buffered=False)
    rec.record([0.0, 42.0])
    rec.record([1.0, 43.0])
    rec.close()
    th.join(timeout=5)
    srv.close()
    assert len(rows_out) == 2
    np.testing.assert_allclose(rows_out[1], [1.0, 43.0])


def test_factory():
    rec = io.open_recorder("mem:", ["x"])
    rec.record([1.0])
    assert isinstance(rec, MemoryRecorder)


# ---------------------------------------------------------------------------
# serialization
# ---------------------------------------------------------------------------


def test_chain_spec_roundtrip(tmp_path):
    from reak_tpu.kte import models

    spec = models.manip_3r3r()
    p = str(tmp_path / "arm.json")
    io.save_scene(p, spec)
    spec2 = io.load_scene(p)
    assert spec2 == spec  # frozen dataclass equality covers all fields


def test_scene_graph_roundtrip(tmp_path):
    """Composite scene: chaser arm + target shapes + query, like the
    chaser_target_data bundles (ref: chaser_target_model_data.hpp:65)."""
    import jax.numpy as jnp
    from reak_tpu.kte import models
    from reak_tpu.geom.shapes import Sphere
    from reak_tpu.geom.proximity import ProxyModel
    from reak_tpu.planning.queries import PlanningQuery

    scene = {
        "chaser": models.planar_2link(),
        "env": ProxyModel(spheres=Sphere(jnp.ones((2, 3)), jnp.array([0.5, 0.2]))),
        "query": PlanningQuery(np.zeros(2), np.ones(2), goal_tolerance=0.1),
        "note": "fixture scene",
    }
    p = str(tmp_path / "scene.json.gz")
    io.save_scene(p, scene)
    scene2 = io.load_scene(p)
    assert scene2["chaser"] == scene["chaser"]
    np.testing.assert_allclose(scene2["env"].spheres.radius, [0.5, 0.2])
    assert scene2["query"].goal_tolerance == 0.1
    assert scene2["note"] == "fixture scene"


def test_unregistered_type_fails():
    class Foo:
        pass

    with pytest.raises(TypeError):
        io.to_document(Foo())


def test_trajectory_roundtrip(tmp_path):
    import jax.numpy as jnp
    import reak_tpu.interp as ip

    traj = ip.waypoint_trajectory(jnp.array([0.0, 1.0]), jnp.zeros((2, 3)))
    p = str(tmp_path / "traj.json")
    io.save_scene(p, traj)
    t2 = io.load_scene(p)
    np.testing.assert_allclose(t2.times, [0, 1])


# ---------------------------------------------------------------------------
# config
# ---------------------------------------------------------------------------


def test_config_paths():
    cfg = io.Config({"mpc": {"horizon": 50}})
    assert cfg.get_path("mpc.horizon") == 50
    cfg.set_path("mpc.qp.iters", 8)
    assert cfg.mpc.qp.iters == 8
    assert cfg.get_path("missing.key", "dflt") == "dflt"


def test_config_from_args(tmp_path):
    base = str(tmp_path / "base.json")
    import json

    with open(base, "w") as f:
        json.dump({"sim": {"dt": 0.01, "steps": 100}}, f)
    cfg = io.config_from_args(
        [f"--config={base}", "--sim.dt=0.02", "--flag", "--name=run1",
         "--weights=[1.0,2.0]"],
        defaults={"sim": {"dt": 0.5}},
    )
    assert cfg.sim.dt == 0.02
    assert cfg.sim.steps == 100
    assert cfg.flag is True
    assert cfg.name == "run1"
    assert cfg.weights == [1.0, 2.0]


# ---------------------------------------------------------------------------
# profiling (SURVEY.md §5.1)
# ---------------------------------------------------------------------------


def test_exec_time_profiler_sections():
    from reak_tpu.io.profiling import ExecTimeProfiler
    import time as _time

    prof = ExecTimeProfiler()
    for _ in range(3):
        with prof.section("work"):
            _time.sleep(0.002)
    with prof.section("other"):
        pass
    s = prof.summary()
    assert s["work"]["count"] == 3
    assert s["work"]["total_s"] >= 0.005
    assert "work" in prof.report()


def test_block_timed():
    import jax.numpy as jnp
    from reak_tpu.io.profiling import block_timed

    out, dt = block_timed(lambda x: jnp.sum(x * x), jnp.arange(100.0))
    assert float(out) > 0 and dt >= 0


def test_binary_archive_roundtrip(tmp_path):
    """Compact binary archive (.rkb) round-trips the same scene graph as
    JSON, with arrays as raw payloads (ref: bin_archiver.hpp:107)."""
    import jax.numpy as jnp
    from reak_tpu.kte import models
    from reak_tpu.geom.shapes import Sphere
    from reak_tpu.geom.proximity import ProxyModel
    from reak_tpu.planning.queries import PlanningQuery

    scene = {
        "chaser": models.manip_3r3r(),
        "env": ProxyModel(spheres=Sphere(jnp.ones((2, 3)), jnp.array([0.5, 0.2]))),
        "query": PlanningQuery(np.zeros(2), np.ones(2), goal_tolerance=0.1),
        "big": np.arange(4096, dtype=np.float32).reshape(64, 64),
        "flags": [True, False, None, 7, 2.5, "s", (1, 2)],
    }
    pb = str(tmp_path / "scene.rkb")
    io.save_scene(pb, scene)
    back = io.load_scene(pb)
    assert back["chaser"] == scene["chaser"]
    np.testing.assert_allclose(back["env"].spheres.radius, [0.5, 0.2])
    np.testing.assert_array_equal(back["big"], scene["big"])
    assert back["big"].dtype == np.float32
    assert back["flags"] == [True, False, None, 7, 2.5, "s", (1, 2)]
    assert back["query"].goal_tolerance == 0.1
    # raw payloads beat JSON text for array-heavy scenes
    pj = str(tmp_path / "scene.json")
    io.save_scene(pj, scene)
    import os
    assert os.path.getsize(pb) < 0.5 * os.path.getsize(pj)


def test_binary_archive_bad_magic(tmp_path):
    p = tmp_path / "bad.rkb"
    p.write_bytes(b"XXXX\x00")
    with pytest.raises(ValueError, match="magic"):
        io.load_scene(str(p))


def test_schemes_self_describe_registered_types():
    """scheme_builder.hpp equivalent: every registered type publishes its
    field names/kinds so foreign tools can read archives without importing
    the package (ref: core/serialization/scheme_builder.hpp)."""
    from reak_tpu.io import serialization as ser

    doc = ser.build_schemes()
    assert doc["format"] == "reak-scheme-1"
    cs = doc["schemes"]["reak.ChainSpec"]
    names = [f["name"] for f in cs["fields"]]
    assert "joint_types" in names and "gravity" in names
    kinds = {f["name"]: f["kind"] for f in cs["fields"]}
    assert all(isinstance(k, str) and k for k in kinds.values())
    # round-trips through JSON (self-description must be plain data)
    import json as _json
    _json.loads(_json.dumps(doc))


def test_objtree_roundtrip_and_field_edit(tmp_path):
    """objtree_archiver.hpp equivalent: flatten to an editable node table,
    edit one leaf, reconstruct (ref: objtree_archiver.hpp:191)."""
    from reak_tpu.io import serialization as ser
    from reak_tpu.kte import models

    spec = models.manip_3r3r()
    tree = ser.to_objtree(spec)
    back = ser.from_objtree(tree)
    assert np.allclose(np.asarray(back.gravity), np.asarray(spec.gravity))
    assert tuple(back.joint_types) == tuple(spec.joint_types)

    # field-level edit: find the gravity leaf and change it
    root = tree["nodes"][tree["root"]]
    assert root["kind"] == "object" and root["type"] == "reak.ChainSpec"
    gid = root["fields"]["gravity"]
    gnode = tree["nodes"][gid]
    if gnode["kind"] == "array":
        ser.objtree_set(tree, gid, np.array([0.0, 0.0, -1.62]))
    else:  # sequence of scalar leaves: edit the z component
        assert gnode["kind"] == "seq"
        ser.objtree_set(tree, gnode["items"][2], -1.62)
    edited = ser.from_objtree(tree)
    assert np.allclose(np.asarray(edited.gravity)[2], -1.62)
