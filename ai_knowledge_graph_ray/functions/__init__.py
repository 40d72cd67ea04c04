"""Pure, Ray-free functions shared by stages and tests."""
