"""Bolt wire protocol (subset) — the reference's primary query channel.

The reference image exposes 7687 and its whole test suite connects with
``GraphDatabase.driver("bolt://…")`` (DatabaseIO.java:30,125;
Dockerfile-trixie:54 ``EXPOSE 7474 7687``; WaitStrategies.java:39 waits
on the Bolt port). This package serves that channel for the PySpark
engine: PackStream serialization + the Bolt v4.4/v5.x message flow
(HELLO/LOGON/RUN/PULL/…) over a threaded TCP server, executing every
statement through the same Cypher façade the HTTP API uses.
"""

from .client import BoltClient  # noqa: F401
from .server import BoltServer, serve  # noqa: F401
