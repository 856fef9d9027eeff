"""The reference's own NYC domain, engine-native: schema (schema.sql),
deterministic fixtures (FIXTURES.md group A), and the server.py-equivalent
query API - so a user of the reference can run every query they run today.
"""
