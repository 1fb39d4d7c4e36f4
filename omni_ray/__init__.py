"""omni_ray — Ray-Data-native data-processing engine."""


def _seed_fsspec_http_stub() -> None:
    """Make ``fsspec.implementations.http`` import-stable under threads.

    aiohttp is absent in this environment, so that import always fails.
    Ray re-attempts it inside every write_* datasink setup
    (path_util._is_http_filesystem) and catches only ModuleNotFoundError —
    but when TWO writes start concurrently (our crawl checkpoints overlap
    store writes in threads), the import-race loser sees a partially
    initialized module and raises plain ImportError, which escapes Ray's
    guard. Seeding a cached stub (only when the real import fails) makes the
    lookup deterministic; Ray only isinstance-checks the class, and with
    aiohttp absent no real HTTPFileSystem can exist anyway.
    """
    import sys
    import types

    name = "fsspec.implementations.http"
    if name in sys.modules:
        return
    try:
        __import__(name)
        return  # real module importable — leave it alone
    except Exception:
        pass
    mod = types.ModuleType(name)

    class HTTPFileSystem:  # sentinel: never instantiated without aiohttp
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules[name] = mod


_seed_fsspec_http_stub()
