"""Dataset→Dataset pipeline stages."""
