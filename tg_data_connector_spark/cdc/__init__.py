from .genlog import gen_changelog, gen_seed_sequences  # noqa: F401
from .dedup import lww_dedup  # noqa: F401
from .quality import split_quarantine, ErrorLimit  # noqa: F401
from .replay import AuditRejected, ReplayEngine, ReplayConfig  # noqa: F401
from .envelopes import from_debezium, from_maxwell, to_debezium  # noqa: F401
