"""Host-side analytics and configuration helpers."""
from . import analysis, theory  # noqa: F401
