from .bloom import BloomFilter  # noqa: F401
from .ddsketch import DDSketchPair  # noqa: F401
from .cms import CountMinSketch  # noqa: F401
from .hll import HLLSketch  # noqa: F401
from .kll import KLLSketch  # noqa: F401
from .tdigest import TDigest  # noqa: F401
from .uddsketch import UDDSketch  # noqa: F401
from .req import REQSketch  # noqa: F401
