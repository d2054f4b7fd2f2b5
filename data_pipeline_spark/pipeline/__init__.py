"""Pipeline-shaped operators: the reconcile -> closure -> idmap -> merge ->
reidentify -> extract chain (SURVEY §3.1) re-expressed as pure DataFrame
dataflow over immutable tables instead of mutable Postgres/Redis/LMDB state.
"""
