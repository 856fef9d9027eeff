"""Shared domain constants.

"Active" order statuses - the analog of the reference's active complaint
domain status IN ('Open','Pending','In Progress') (reference: server.py:172;
full domain constraint at schema.sql:73) mapped onto o_orderstatus.
"""

ACTIVE_STATUSES: tuple[str, ...] = ("O", "P")
