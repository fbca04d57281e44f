"""End-to-end lazy plans replacing the reference's staged pipelines."""
