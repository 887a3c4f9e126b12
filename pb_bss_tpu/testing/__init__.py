from . import random_utils  # noqa: F401
from . import module_asserts  # noqa: F401
