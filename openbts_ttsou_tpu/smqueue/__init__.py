"""SMS store-and-forward daemon (reference: smqueue/)."""

from openbts_ttsou_tpu.smqueue.queue import ShortMsg, ShortMsgState, SMq  # noqa: F401
