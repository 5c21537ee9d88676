from .common import *  # noqa: F401,F403
from .oadg import *  # noqa: F401,F403
