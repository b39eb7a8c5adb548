from .mesh import make_mesh  # noqa: F401
from .render import ShardedProgressiveRenderer, make_sharded_tick  # noqa: F401
