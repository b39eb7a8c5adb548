from . import camera, inscatter, pathtracer, progressive  # noqa: F401
