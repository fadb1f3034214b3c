"""Wire-format sinks (K1-K3): .osm XML, .o5m, and .pbf writers.

Round-1 declared these non-goals (the engine's native sink is
Parquet); round-2 adds them because a writer the reference binary
can READ is the strongest differential harness available: engine
writes → osmconvert reads → outputs must agree with the engine's
own sinks. See tests/test_wire_sinks.py.
"""

from .o5m import encode_o5m
from .ogb import encode_ogb
from .osmxml import encode_osc, encode_osm_xml
from .pbf import encode_pbf
from .spark import write_wire_dir, write_wire_single

__all__ = [
    "encode_o5m",
    "encode_ogb",
    "encode_osc",
    "encode_osm_xml",
    "encode_pbf",
    "write_wire_dir",
    "write_wire_single",
]
