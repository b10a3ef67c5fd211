// Empty stand-in for IT++'s <itpp/comm/galois.h>: the reference's
// SystemC/NGDBF/inc/nodes.h includes it but uses nothing from it (leftover
// include).  Providing this stub lets the design build without IT++.
#ifndef SCSIM_ITPP_GALOIS_STUB_H_
#define SCSIM_ITPP_GALOIS_STUB_H_
#endif
