"""DataFrame → DataFrame operator builders."""
