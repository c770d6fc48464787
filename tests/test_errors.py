"""Error-variant exhaustiveness: every class constructs, raises, and
formats (the reference tests every thiserror variant's Display —
tests/e2e/spz.rs:277-469, tests/e2e/compute_bundle.rs:242-378)."""

import pytest

from wgpu_3dgs_core_tpu import errors as E


@pytest.mark.parametrize(
    "exc, fragments",
    [
        (E.SpzEmptyIteratorError("empty SPZ gaussian iterator"), ["empty"]),
        (
            E.SpzInvalidMixedVariantError("position", "f16", "fixed24/12"),
            ["position", "f16", "fixed24/12"],
        ),
        (E.SpzCountMismatchError(3, 5), ["3", "5", "count mismatch"]),
        (
            E.SpzPositionFloat16MismatchError(True, False),
            ["float16=True", "float16=False"],
        ),
        (
            E.SpzRotationQuatSmallestThreeMismatchError(False, True),
            ["smallest-three=False", "smallest-three=True"],
        ),
        (E.SpzShDegreeMismatchError(1, 3), ["degree 1", "degree 3"]),
        (E.DownloadBufferError("poll failed"), ["poll failed"]),
        (E.GaussiansBufferUpdateError(2, 4), ["2", "4"]),
        (E.GaussiansBufferUpdateRangeError(3, 2, 4), ["3", "2", "4"]),
        (E.GaussiansBufferTryFromBufferError(100, 16), ["100", "16"]),
        (E.FixedSizeBufferWrapperError(12, 16), ["12", "16"]),
        (E.KernelBundleResourceCountError(1, 2, 3), ["1", "2", "3"]),
        (E.KernelBundleWorkgroupLimitError(9000, 8192), ["9000", "8192"]),
        (E.MissingResourceLayoutError("no layouts"), ["no layouts"]),
        (E.MissingKernelError("no kernel"), ["no kernel"]),
        (E.MissingEntryPointError("no entry"), ["no entry"]),
        (E.MissingLayoutConfigError("needs config"), ["needs config"]),
        (E.IrreversibleConfigError("lossy"), ["lossy"]),
    ],
)
def test_error_formats_and_raises(exc, fragments):
    msg = str(exc)
    for frag in fragments:
        assert frag in msg, (msg, frag)
    assert isinstance(exc, E.Gs3dError)
    with pytest.raises(type(exc)):
        raise exc


def test_error_hierarchy():
    assert issubclass(E.SpzEmptyIteratorError, E.SpzGaussiansCollectError)
    assert issubclass(E.SpzInvalidMixedVariantError,
                      E.SpzGaussiansCollectError)
    assert issubclass(E.SpzCountMismatchError, E.SpzGaussiansFromIterError)
    assert issubclass(E.KernelBundleResourceCountError,
                      E.KernelBundleCreateError)
    assert issubclass(E.MissingLayoutConfigError, E.KernelBundleBuildError)


def test_initialize_multihost_wrapper(monkeypatch):
    """The multihost bring-up wrapper: forwards args, tolerates repeated
    initialization, returns the process index."""
    import jax

    from wgpu_3dgs_core_tpu.parallel import mesh as M

    calls = []

    def fake_init(coordinator_address=None, num_processes=None,
                  process_id=None, local_device_ids=None):
        calls.append((coordinator_address, num_processes, process_id))

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    idx = M.initialize_multihost("10.0.0.1:8476", num_processes=2,
                                 process_id=0)
    assert idx == jax.process_index()
    assert calls == [("10.0.0.1:8476", 2, 0)]
    # Second call is a no-op (the sentinel sticks to the fake).
    M.initialize_multihost()
    assert len(calls) == 1

    # An already-initialized runtime is tolerated, other errors propagate.
    def raising_init(**kw):
        raise RuntimeError("backend already initialized elsewhere")

    monkeypatch.setattr(jax.distributed, "initialize", raising_init)
    M.initialize_multihost()  # no raise (sentinel or message check)

    def bad_init(**kw):
        raise RuntimeError("connection refused")

    monkeypatch.setattr(jax.distributed, "initialize", bad_init)
    bad_init._gs3d_done = False
    with pytest.raises(RuntimeError, match="connection refused"):
        M.initialize_multihost()
