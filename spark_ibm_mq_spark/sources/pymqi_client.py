"""Real-broker adapter seam (optional, import-gated).

The `ibmmq` DataSource talks to a broker through four calls —
``messages(from_pos, limit)``, ``ack(upto_pos)``, ``depth()``,
``get_inhibited()`` — implemented by FakeMQBroker for tests. This module
sketches the same interface over `pymqi` (the public IBM MQ Python client)
so a real queue manager drops in without touching the reader:

- connect with MQCSP auth               ↔ IBMMQReceiver.java:403-415
- browse cursor / destructive get       ↔ IBMMQReceiver.java:131-136,203-211
- syncpoint commit/backout on ack       ↔ IBMMQReceiver.java:349-393
- CCSID conversion via GMO_CONVERT      ↔ IBMMQReceiver.java:204,242-244

No broker or pymqi exists in this environment, so constructing the client
raises NotImplementedError after the import gate; the class documents the
mapping and keeps the seam honest.
"""

from __future__ import annotations


class PyMQIBroker:
    """Drop-in for FakeMQBroker against a live queue manager via pymqi."""

    def __init__(
        self,
        host: str,
        port: int,
        qmgr: str,
        channel: str,
        queue: str,
        user: str | None = None,
        password: str | None = None,
        ccsid: int | None = None,
    ) -> None:
        try:
            import pymqi  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "pymqi is not installed in this environment; use the fake "
                "broker (provider=fake) or install pymqi against a real "
                "queue manager"
            ) from exc
        # Real implementation outline (kept for the adapter contract):
        #   cd = pymqi.CD(ChannelName=channel, ConnectionName=f"{host}({port})")
        #   sco, csp = pymqi.SCO(), pymqi.CSP(CSPUserId=user, CSPPassword=password)
        #   self._qmgr = pymqi.QueueManager(None); self._qmgr.connect_with_options(...)
        #   browse queue: MQOO_BROWSE + MQGMO_BROWSE_FIRST/NEXT cursor == from_pos
        #   destructive: MQGMO_SYNCPOINT gets; ack(upto) == qmgr.commit()
        #   depth(): inquire MQIA_CURRENT_Q_DEPTH; get_inhibited(): MQIA_INHIBIT_GET
        raise NotImplementedError("real-broker adapter outline; see docstring")
