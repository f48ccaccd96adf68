"""Concurrency stress for the atomic stage-publish protocol.

The protocol (plans/wire.publish_stage) must survive many publishers
racing on one stage: after the dust settles the stage verifies against
its manifest, its content is exactly ONE publisher's payload (no
interleaving), and no tmp/stale debris remains. This pins the
review-fix behavior (rename-first, verify-blocker, move-aside retry)
under a real race, not just the single-process path the driver
exercises.
"""

from __future__ import annotations

import json
import os
import threading

from hrfco_data_pipeline_spark.plans.wire import publish_stage


def _builder(payload: bytes, n_files: int):
    def build(tmp: str) -> None:
        os.makedirs(tmp, exist_ok=True)
        for i in range(n_files):
            with open(os.path.join(tmp, f"part-{i}"), "wb") as fh:
                fh.write(payload * (i + 1))

    return build


def _stage_payloads(stage: str) -> dict[str, int]:
    with open(os.path.join(stage, ".hrfco_manifest.json")) as fh:
        return json.load(fh)


def test_racing_publishers_leave_one_valid_stage(tmp_path):
    for round_no in range(5):
        stage = str(tmp_path / f"stage_{round_no}")
        errors: list[BaseException] = []
        barrier = threading.Barrier(16)

        def run(i: int) -> None:
            try:
                barrier.wait(10)
                # distinct payload sizes per publisher: file sizes
                # identify whose publish won
                publish_stage(stage, _builder(b"x" * (i + 1), 3))
            except BaseException as e:  # noqa: BLE001
                errors.append(e)

        threads = [
            threading.Thread(target=run, args=(i,)) for i in range(16)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(30)
        assert not errors, errors
        # exactly one coherent payload: manifest matches on-disk sizes,
        # and all three parts belong to the SAME publisher (sizes are
        # i+1, 2(i+1), 3(i+1) for one i)
        want = _stage_payloads(stage)
        assert set(want) == {"part-0", "part-1", "part-2"}
        for name, size in want.items():
            assert os.path.getsize(os.path.join(stage, name)) == size
        unit = want["part-0"]
        assert want["part-1"] == 2 * unit and want["part-2"] == 3 * unit
        # no debris: every tmp/stale dir was cleaned up
        debris = [
            p
            for p in os.listdir(tmp_path)
            if ".tmp." in p or ".stale." in p
        ]
        assert debris == []


def test_publish_reuses_valid_stage(tmp_path):
    stage = str(tmp_path / "stage")
    publish_stage(stage, _builder(b"a", 2))
    first = _stage_payloads(stage)
    calls = []

    def rebuilding(tmp: str) -> None:
        calls.append(tmp)
        _builder(b"bb", 2)(tmp)

    # a valid stage is reused without rebuilding
    publish_stage(stage, rebuilding)
    assert calls == []
    assert _stage_payloads(stage) == first
    # a corrupted stage (manifest size mismatch) is rebuilt
    with open(os.path.join(stage, "part-0"), "ab") as fh:
        fh.write(b"junk")
    publish_stage(stage, rebuilding)
    assert len(calls) == 1
    assert _stage_payloads(stage)["part-0"] == 2
