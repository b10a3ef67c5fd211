// scsim entry point: Accellera SystemC provides main() in libsystemc and
// calls the application's sc_main; this translation unit plays that role
// for the minimal kernel in systemc.h.
#include "systemc.h"

int main(int argc, char* argv[]) { return sc_main(argc, argv); }
