from . import procedural  # noqa: F401
