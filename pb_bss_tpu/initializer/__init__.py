"""Affiliation initializers (reference: pb_bss/initializer/)."""
from . import iid  # noqa: F401
from . import deflation  # noqa: F401
from . import deterministic  # noqa: F401
